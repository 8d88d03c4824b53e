"""User-facing conveniences mirroring the reference's ``vastdb/util.py``.

Most of that module is either already re-expressed elsewhere here —
``create_table_from_files`` and the three schema-merge policies live in
``sources/parquet_import.py``; ``prefix_to_range`` is the manifest pruner's
startswith interval (plans/pruning.py:132); record-batch wire serialization
is subsumed by parquet — leaving only the endpoint-range helper below
(reference: vastdb/util.py:128-145).
"""

from __future__ import annotations

import re

from .errors import InvalidArgument

# '<scheme>://<three dotted octets>.<start>-<end>[:port][/path]' (the
# reference accepts http and no suffix; https and a port/path suffix —
# carried onto every expanded endpoint — are extensions here)
_RANGE_RE = re.compile(
    r"^(?P<base>[a-z][a-z0-9+.-]*://\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"\.(?P<lo>\d{1,3})-(?P<hi>\d{1,3})"
    r"(?P<suffix>(?::(?P<port>\d+))?(?:/[^\s]*)?)$"
)


def expand_ip_ranges(endpoints: list[str]) -> list[str]:
    """Expand endpoint strings whose last octet is a range, e.g.
    ``'http://172.19.101.1-16'`` -> 16 endpoints; a trailing port and/or
    path (``'http://172.19.101.1-16:8080/api'``) is carried onto each
    expanded endpoint. Strings without a range pass through verbatim,
    order preserved (reference: vastdb/util.py:128).
    """
    out: list[str] = []
    for endpoint in endpoints:
        m = _RANGE_RE.match(endpoint)
        if not m:
            out.append(endpoint)
            continue
        lo, hi = int(m.group("lo")), int(m.group("hi"))
        if lo > hi:
            raise InvalidArgument(
                f"invalid last-octet range {lo}-{hi} in {endpoint!r}"
            )
        # a ranged endpoint with a nonsense port must raise, not silently
        # pass through unexpanded (that would mask a typo in an endpoint
        # list); non-ranged endpoints are still passed through untouched
        port = m.group("port")
        if port is not None and not 1 <= int(port) <= 65535:
            raise InvalidArgument(
                f"invalid port {port!r} in ranged endpoint {endpoint!r}"
            )
        suffix = m.group("suffix") or ""
        out.extend(
            f"{m.group('base')}.{octet}{suffix}" for octet in range(lo, hi + 1)
        )
    return out
