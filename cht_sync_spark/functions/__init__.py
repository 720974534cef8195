from cht_sync_spark.functions.json_doc import (
    sanitise,
    redact_security,
    parse_rev,
    doc_to_row,
    doc_to_row_arrow,
)

__all__ = [
    "sanitise",
    "redact_security",
    "parse_rev",
    "doc_to_row",
    "doc_to_row_arrow",
]
