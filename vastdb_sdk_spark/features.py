"""Engine capability flags.

Reference: ``vastdb.features.Features`` gates SDK behavior on the server
version (vastdb/features.py:10-63 — check_imports_table, check_enforce_
semisorted_projection, check_elysium, check_external_row_ids_allocation,
check_vector_index, ...). Our engine implements everything locally, so every
flag is True — the class exists so reference-shaped code that probes
``session.features`` keeps working, and so future deployments can switch
capabilities off.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Features:
    imports_table: bool = True
    semisorted_projections: bool = True
    enforce_semisorted_projection: bool = True
    elysium: bool = True
    external_row_ids_allocation: bool = True
    vector_index: bool = True
    blob_expansion: bool = True
    timezone_support: bool = True
    snapshots: bool = True
    # extensions beyond the reference
    sql_tier: bool = True
    streaming: bool = True
    llm_pipeline_operators: bool = True

    def check_imports_table(self) -> None:
        pass

    def check_elysium(self) -> None:
        pass

    def check_external_row_ids_allocation(self) -> None:
        pass

    def check_vector_index(self) -> None:
        pass

    def check_timezone(self) -> None:
        pass
