"""Paginated listing protocol for catalog objects.

Reference semantics (vastdb/_internal.py:1188-1236, 1483-1531, 1623-1686):
every listing RPC takes ``next_key`` (opaque integer cursor, 0 to start),
``max_keys`` (page size), ``name_prefix`` and ``exact_match``, and returns
``(items, next_key, is_truncated)``; callers loop until ``is_truncated`` is
False (vastdb/schema.py:71-83, 136-149). Here the "server" is the
transaction's manifest snapshot, so a page is a slice of a sorted name
list — but the wire protocol is preserved so SDK-style pagination loops
(and tests like the reference's test_tables.py:1430-1464) behave
identically.
"""

from __future__ import annotations

DEFAULT_PAGE_SIZE = 1000


def paginate_names(
    names: list[str],
    next_key: int = 0,
    max_keys: int | None = None,
    name_prefix: str = "",
    exact_match: bool = False,
) -> tuple[list[str], int, bool]:
    """One page of ``names`` (already sorted) under the reference's listing
    protocol. Returns ``(page, next_key, is_truncated)``.

    ``next_key`` is the index into the *filtered* sorted list — stable for a
    fixed manifest snapshot, which is the only scope a transaction sees.
    """
    if max_keys is None:
        max_keys = DEFAULT_PAGE_SIZE
    if max_keys <= 0:
        raise ValueError(f"max_keys must be positive, got {max_keys}")
    if next_key < 0:
        raise ValueError(f"next_key must be >= 0, got {next_key}")
    if exact_match:
        filtered = [n for n in names if n == name_prefix]
    elif name_prefix:
        filtered = [n for n in names if n.startswith(name_prefix)]
    else:
        filtered = list(names)
    page = filtered[next_key : next_key + max_keys]
    new_key = next_key + len(page)
    return page, new_key, new_key < len(filtered)
