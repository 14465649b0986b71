from .pipeline import ScanResult, scan_transcripts

__all__ = ["ScanResult", "scan_transcripts"]
