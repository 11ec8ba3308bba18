"""Shared URL helpers for the HTTP source backends.

One definition (round-8 review: restproxy.py and schemaregistry.py
carried byte-identical private copies of the path-segment quoter, free
to drift independently — e.g. one growing a ``safe='/'`` the other
lacks).
"""

from __future__ import annotations

from urllib.parse import quote


def quote_segment(segment) -> str:
    """URL-quote one path segment: topic/group/subject names may carry
    '/', space, '%', or other URL-significant characters — unquoted
    they address the WRONG resource (or fail outright)."""
    return quote(str(segment), safe="")
