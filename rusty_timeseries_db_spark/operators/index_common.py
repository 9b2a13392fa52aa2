"""Shared deletion-lifecycle plumbing for the persisted indexes
(round 14 review: ``Bm25Index`` and ``IvfIndex`` carried verbatim
copies of these four helpers — crash-safety-critical code must have
ONE implementation, or a fix lands in one index and not the other).

The mixin owns what is genuinely identical across index layouts: the
compacting-marker guard, the tombstone sidecar read, the existence
probe, and the compact-advice threshold. ``remove()``/``compact()``
stay per-index — postings/terms/docs vs a cell tree are different
enough that sharing them would mean parameterizing every line.

Host-class contract: ``self.spark``, ``self.tombstones_path``,
``self.marker_path``, ``self._manifest()``, and ``_ROWS_FIELD`` (the
manifest key holding the LIVE row/doc count — ``"n_docs"`` for BM25,
``"n_rows"`` for IVF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class IndexLifecycleMixin:
    #: manifest key of the live row/doc count (host class overrides)
    _ROWS_FIELD = "n_rows"

    #: default tombstone fraction past which compact() is advised —
    #: below it, the per-query anti-join and the dead bytes are noise;
    #: above it, a rewrite pays for itself in scan savings
    DEFAULT_MAX_REMOVED_FRAC = 0.2

    def _dir_exists(self, path: str) -> bool:
        from ..fsutil import fs_for, hpath

        return fs_for(self.spark, path).exists(hpath(self.spark, path))

    def _tombstones(self) -> DataFrame | None:
        if not self._dir_exists(self.tombstones_path):
            return None
        return self.spark.read.parquet(self.tombstones_path)

    def _check_not_compacting(self, verb: str) -> None:
        """query()/add()/remove() all refuse while a compacting marker
        exists — mid-swap state is internally inconsistent, and a
        mutation racing the rewrite could land rows the in-flight
        compact never saw, to be swapped away silently."""
        if self._dir_exists(self.marker_path):
            raise RuntimeError(
                f"an interrupted compact() left this index mid-swap — "
                f"re-run compact() (it converges from any interruption "
                f"point) before {verb}"
            )

    def should_compact(self, max_removed_frac: float | None = None) -> bool:
        """True when the tombstoned fraction ``n_removed / (live +
        n_removed)`` exceeds the threshold — time to schedule
        ``compact()`` (the deletion-side twin of the IVF
        ``should_rebuild`` drift advice). An index with no removals
        never needs one."""
        man = self._manifest()
        live = int(man.get(self._ROWS_FIELD, 0))
        n_removed = int(man.get("n_removed", 0))
        total = live + n_removed
        frac = (n_removed / total) if total > 0 else 0.0
        limit = (
            max_removed_frac
            if max_removed_frac is not None
            else self.DEFAULT_MAX_REMOVED_FRAC
        )
        return frac > limit
