from .stream import routed_stream, run_stream_once

__all__ = ["routed_stream", "run_stream_once"]
