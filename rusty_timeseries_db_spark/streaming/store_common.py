"""Shared manifest plumbing for the streaming summary stores (round 16
— ADVICE r15 medium #2): topk (streaming/sketch.py), quantiles
(streaming/quantile.py) and state durations (streaming/state.py) all
keep a tiny JSON manifest holding two independently-owned watermarks —
the sink's ``last_applied_batch`` (plus the duration store's
``last_obs_versions``) and the compactor's ``base_upto``.

Before this module the stores used the FLAT ``write_json_manifest``
protocol with an unsynchronized read-modify-write: each writer
re-read the manifest "immediately before" its commit, which NARROWED
the sink-vs-compact race but did not close it (the other writer can
still land between the re-read and the write, silently rolling back
``base_upto`` or ``last_applied_batch``), and the flat protocol's
delete-then-rename leaves a crash window where the manifest reads as
ABSENT — after which ``apply_*_batch`` resets to a fresh default
(``base_upto=-1``) and, because compaction DELETES folded summary
dirs, the served rows below the lost ``base_upto`` are gone for good.
``fsutil`` itself documents the flat protocol as unsuitable for
streaming sinks.

The fix is the same one the persisted indexes took in round 15
(``operators/index_common.py``), adapted for COOPERATING writers:
commits go through the versioned CAS protocol
(``fsutil.write_versioned_manifest`` with ``expected_version``), and a
:class:`..fsutil.ManifestVersionConflict` triggers a bounded
re-read-and-retry instead of a raise — the sink and the compactor
each mutate ONLY their own fields, so replaying the mutation against
the fresh snapshot is always correct and the loop converges (the
conflict means the other writer advanced ITS fields; ours are
untouched in the fresh copy). Versions live in a sibling directory
``<store>.<kind>.manifest/`` and reads are old-or-new atomic — the
vanished-manifest crash window is gone. A legacy flat
``<store>.<kind>.json`` file reads as CAS token ``None`` and is
retired on the first versioned commit, so pre-r16 stores migrate in
place (the index_common migration contract).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

#: stem of the versioned manifest files inside the sibling dir
_STEM = "manifest"

#: bounded retry for cooperating-writer commits. Conflicts need one
#: interleaved commit each to fire, so even sink+compact+an operator
#: re-run contending simultaneously settle in 2-3 attempts; hitting
#: the cap means a writer is committing in a tight loop — raising the
#: last conflict is more honest than spinning forever.
_MAX_ATTEMPTS = 8


def manifest_dir(store_path: str, kind: str) -> str:
    """Sibling directory holding the versioned manifest commits —
    ``<store>.<kind>.manifest/manifest.v<N>.json`` (never inside the
    store root: ``summaries/``/``deltas/``/``base/`` are parquet
    roots)."""
    return store_path.rstrip("/") + f".{kind}.manifest"


def legacy_manifest_path(store_path: str, kind: str) -> str:
    """The pre-r16 flat manifest file — still read as a fallback."""
    return store_path.rstrip("/") + f".{kind}.json"


def read_store_manifest_cas(
    spark: SparkSession, store_path: str, kind: str
) -> "tuple[int | None, dict | None]":
    """(CAS token, payload): the highest committed versioned manifest
    when one exists; else the legacy flat file's payload with token
    ``None`` (the first CAS write then expects 'no version yet', so
    two concurrent first-writers on a legacy store still conflict);
    (None, None) on a never-started store."""
    from ..fsutil import read_json_manifest, read_versioned_manifest_versioned

    got = read_versioned_manifest_versioned(
        spark, manifest_dir(store_path, kind), _STEM
    )
    if got is not None:
        return got
    return None, read_json_manifest(
        spark, legacy_manifest_path(store_path, kind)
    )


def read_store_manifest(
    spark: SparkSession, store_path: str, kind: str
) -> "dict | None":
    """The store's current manifest dict, or None on a never-started
    store (read-only callers: serving, validation)."""
    return read_store_manifest_cas(spark, store_path, kind)[1]


def update_store_manifest(
    spark: SparkSession,
    store_path: str,
    kind: str,
    mutate: Callable[[dict], None],
    default: "dict | None" = None,
) -> dict:
    """CAS read-modify-write with bounded retry — the cooperating-
    writer commit every store mutation goes through. Each attempt
    re-reads the FRESH manifest (falling back to ``default`` — the
    caller's validated cold-start dict — when no manifest exists yet),
    applies ``mutate`` (which must touch ONLY the calling writer's own
    fields), and CAS-commits; a :class:`..fsutil.
    ManifestVersionConflict` means another cooperating writer advanced
    its own fields in between — retrying against the fresh snapshot
    preserves that writer's commit instead of rolling it back. Returns
    the committed dict. Retires the legacy flat file after a
    successful commit (readers prefer the versioned manifest from
    then on)."""
    from ..fsutil import ManifestVersionConflict, delete_path, write_versioned_manifest

    last_conflict: Exception | None = None
    for _ in range(_MAX_ATTEMPTS):
        ver, man = read_store_manifest_cas(spark, store_path, kind)
        if man is None:
            if default is None:
                raise FileNotFoundError(
                    f"no {kind} store manifest at {store_path} — nothing "
                    "to update"
                )
            man = dict(default)
        mutate(man)
        try:
            write_versioned_manifest(
                spark,
                manifest_dir(store_path, kind),
                _STEM,
                man,
                expected_version=ver,
            )
        except ManifestVersionConflict as e:
            last_conflict = e
            continue
        delete_path(spark, legacy_manifest_path(store_path, kind))
        return man
    raise IOError(
        f"{kind} store manifest at {store_path}: {_MAX_ATTEMPTS} "
        "consecutive CAS conflicts — a writer is committing in a tight "
        "loop; back off and retry"
    ) from last_conflict


def is_missing_summaries_error(e: Exception) -> bool:
    """True exactly for the two AnalysisException conditions a
    legitimately summary-less store produces on read — the directory
    does not exist (``PATH_NOT_FOUND``) or exists with no parquet
    footers after a compaction cleanup (``UNABLE_TO_INFER_SCHEMA``).
    Matched on the exception's error CLASS, not message substrings
    (ADVICE r15 low: substring matching over bare ``Exception`` could
    misclassify corrupt footers or permission faults that happen to
    embed those tokens as 'no summaries yet'). Everything else —
    corrupt files, auth failures, connectivity — propagates as
    itself."""
    from pyspark.errors import AnalysisException

    if not isinstance(e, AnalysisException):
        return False
    cond: "str | None" = None
    for attr in ("getCondition", "getErrorClass"):
        getter = getattr(e, attr, None)
        if getter is None:
            continue
        try:
            cond = getter()
        except Exception:
            continue
        if cond is not None:
            break
    if cond is None:
        return False
    return cond.startswith("PATH_NOT_FOUND") or cond.startswith(
        "UNABLE_TO_INFER_SCHEMA"
    )
