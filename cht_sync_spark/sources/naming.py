"""Source naming: CouchDB URL -> canonical source label (SURVEY.md §2.2 P6).

The reference names each feed source ``hostname + pathname`` of its couch
URL (couch2pg/src/importer.js:186-187, tested importer.spec.js:84-95), e.g.
``https://user:pw@couch.example.com:5984/medic`` -> ``couch.example.com/medic``.
Credentials, scheme, port, query and fragment are dropped.

Both a driver-side helper (for configuring sources) and a Catalyst column
expression (for deriving labels from URL columns at scale) are provided;
they implement identical semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://[user[:pw]@]host[:port]/path[?query][#fragment]
_URL_RE = re.compile(
    r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?(?P<host>[^/:?#]+)(?::\d+)?(?P<path>/[^?#]*)?"
)


def source_name(url: str) -> str:
    """hostname + pathname (no trailing slash), reference parity."""
    m = _URL_RE.match(url)
    if not m:
        return url
    path = (m.group("path") or "").rstrip("/")
    return m.group("host") + path


def source_name_col(url: Column) -> Column:
    """Columnar form: the same hostname+pathname derivation as a pure
    Catalyst expression (regexp_extract + rtrim), codegen'd — for feeds that
    carry their origin URL per row."""
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/?#]*(/[^?#]*)", 1)
    return F.concat(host, F.regexp_replace(path, r"/+$", ""))
