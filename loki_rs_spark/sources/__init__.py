from .transcripts import (
    DEFAULT_REP,
    TEXT_RULES,
    TOOL_RULES,
    load_documents,
    load_transcripts,
    transcripts_duckdb_cte,
)

__all__ = [
    "DEFAULT_REP",
    "TEXT_RULES",
    "TOOL_RULES",
    "load_documents",
    "load_transcripts",
    "transcripts_duckdb_cte",
]
