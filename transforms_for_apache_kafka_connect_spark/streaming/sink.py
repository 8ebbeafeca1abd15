"""Lake-table layer: key-partitioned MERGE with an exactly-once ledger.

north_rule: "key-partitioned MERGE INTO Iceberg ... exactly-once
semantics through idempotent commit sequencing and resumable
checkpoints with per-partition lineage".

The sandbox has no Iceberg runtime jar (SURVEY.md §7.5), so the tested
default is a hermetic copy-on-write table with the same interface an
Iceberg-backed impl would have (``merge`` / ``read`` / ``committed``):

* data files are hash-bucketed by key: ``pmod(xxhash64(key), n_buckets)``
  — a merge only reads and rewrites the buckets its updates touch
  (bucket pruning == Iceberg partition pruning on a bucket transform);
* every merge writes NEW files under a per-(version,batch) directory and
  then atomically swaps a CURRENT pointer (os.replace) at a manifest
  that lists the live files per bucket — readers never see a partial
  commit, and a crash mid-merge leaves only orphaned files, so replay
  is idempotent by construction;
* the commit ledger (committed (epoch, batch_id) set + per-partition
  lineage rows) lives INSIDE the manifest, so data and ledger commit in
  the same atomic swap — the exactly-once invariant;
* schema evolution: merge unions target/update payload columns by name
  (additive-only), and the manifest records the widened schema
  (north_star: "added columns ... propagate automatically").

Scale notes (100 TB): the full_outer merge join shuffles only the
touched buckets' data; LWW dedupe upstream guarantees ≤1 update row per
key per batch, so merge-join skew is bounded by keys-per-bucket, not by
the zipf event skew (hot-repo salting concern lands on the dedupe
aggregate, which map-side combines — see dedupe.py). AQE handles
residual bucket-size skew. Target file sizing via
``target_rows_per_file`` repartition before write.
"""

from __future__ import annotations

import json
import os
import random
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, ClassVar

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import EmptyTableError

_sink_log = logging.getLogger(__name__)

BUCKET_COL = "__bucket"


def _bucket_expr(key_cols: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


#: lossless numeric promotion lattice (schema-JSON type names). Only
#: these type drifts are accepted as schema evolution: the integral
#: up-chain, float→double, and small-integral→double — every one is
#: value-preserving AND supported as a widening read by Spark 4's
#: Parquet readers (an int32 file scans correctly under a bigint or
#: double read schema). long↔float/double is REFUSED: Spark's union
#: coercion would silently pick the floating type and corrupt 2^53+
#: longs — a CDC engine must fail loudly and demand an explicit cast.
_INTEGRAL_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_FRACTIONAL_RANK = {"float": 0, "double": 1}
_JSON_TO_DDL = {
    "byte": "tinyint", "short": "smallint", "integer": "int",
    "long": "bigint", "float": "float", "double": "double",
}


def _wider_json_type(name: str, a, b):
    """Widened schema-JSON type for a clashing field, or raise."""
    from transforms_for_apache_kafka_connect_spark.errors import (
        SchemaEnforcementError,
    )

    # void (an untyped all-NULL column, e.g. a literal None a view fold
    # synthesized) is the bottom type: casting it to ANY type is
    # lossless, so the other side always wins
    if a == "void":
        return b
    if b == "void":
        return a
    if a in _INTEGRAL_RANK and b in _INTEGRAL_RANK:
        return a if _INTEGRAL_RANK[a] >= _INTEGRAL_RANK[b] else b
    if a in _FRACTIONAL_RANK and b in _FRACTIONAL_RANK:
        return a if _FRACTIONAL_RANK[a] >= _FRACTIONAL_RANK[b] else b
    small = ("byte", "short", "integer")
    if (a in small and b == "double") or (b in small and a == "double"):
        return "double"
    raise SchemaEnforcementError(
        f"incompatible type evolution on column {name!r}: table has "
        f"{a!r}, update batch has {b!r} — not a lossless widening "
        f"(allowed: byte→short→int→long, float→double, "
        f"byte/short/int→double). Cast the source explicitly."
    )


def _is_statically_empty(df: DataFrame) -> bool:
    """True iff Catalyst proved ``df`` empty (optimized plan collapsed
    to a zero-row LocalRelation) — driver-side only, no job. Note this
    catches only statically-known emptiness; a runtime-empty source
    (e.g. ``createDataFrame([], schema)`` is a LogicalRDD leaf) is
    invisible here and is handled by ``observation_pruned`` instead."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return (
            plan.getClass().getSimpleName() == "LocalRelation"
            and plan.data().isEmpty()
        )
    except Exception:
        return False


def observation_pruned(exc: Exception) -> bool:
    """True iff an ``Observation.get`` failure means the CollectMetrics
    node was eliminated because its subtree was empty.

    When AQE's empty-relation propagation (or PropagateEmptyRelation)
    removes the observed subtree, the JVM-side metrics row comes back as
    a schema-less empty row and ``PythonSQLUtils.toPyRow`` fails its
    ``GenericRowWithSchema`` assertion. A metrics row that actually
    fired always carries a schema, so this signature is specific to
    'observed plan produced zero rows' — the one failure mode the batch
    error gate may safely treat as zero per-record errors. Any other
    exception (JVM crash, py4j transport error) does NOT match and must
    keep failing the batch."""
    try:
        s = f"{exc!r} {exc!s}"  # py4j puts the Java exception in __str__
    except Exception:
        s = repr(exc)
    return "toPyRow" in s and "AssertionError" in s


def _concurrent_map(items: list, fn) -> dict:
    """{item: fn(item)} with a thread pool — the per-commit sidecar
    harvests (parquet footer reads, bloom builds) are I/O + C++ parse
    that release the GIL, and running them serially was a measurable
    driver stall per commit (~47 ms x files)."""
    if not items:
        return {}
    if len(items) == 1:
        return {items[0]: fn(items[0])}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(items))) as ex:
        return dict(zip(items, ex.map(fn, items)))


def _harvest_file_stats(path: str, cols: list[str] | None = None) -> dict:
    """Per-column [min, max] zone map for one parquet file, read from
    the file FOOTER only (pyarrow metadata — driver-side, no Spark job,
    no data pages touched). The writers already paid for these stats;
    harvesting them into the manifest is free data skipping.

    Only top-level primitive columns with JSON-safe orderable values
    (int/float/str/bool) are kept — nested paths and binary/temporal
    types are skipped (absent stats simply mean 'cannot prune on this
    column', never wrong results)."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
    except Exception:
        return {}
    agg: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaf — not a top-level column
                continue
            if cols is not None and name not in cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                # any row group without stats poisons the column for
                # this file: mark unusable
                agg[name] = None
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes) and isinstance(mx, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    agg[name] = None
                    continue
            if not (
                isinstance(mn, (int, float, str)) and type(mn) is type(mx)
            ) or isinstance(mn, bool):
                agg[name] = None
                continue
            cur = agg.get(name)
            if cur is None and name in agg:
                continue  # poisoned by an earlier row group
            if cur is None:
                agg[name] = [mn, mx]
            else:
                agg[name] = [min(cur[0], mn), max(cur[1], mx)]
    out = {k: v for k, v in agg.items() if v is not None}
    # the footer also carries the file's EXACT row count for free —
    # recorded under a dunder key no column can collide with; the
    # zone-map matcher looks keys up by column name so it never sees
    # it. _swap sums these into the manifest's table-level total_rows
    # for COW tables (the Observation-based count only sees the
    # touched buckets on a sparse merge).
    out["__rows"] = int(md.num_rows)
    return out


#: double-hashing probe count for the per-file key Bloom sidecars
_BLOOM_K = 7
#: bits per key (~1% false-positive rate at k=7)
_BLOOM_BITS_PER_KEY = 10
#: the two 16-byte siphash keys feeding h(i) = h1 + i*h2
_BLOOM_HASH_KEYS = ("sparkgraftbloom1", "sparkgraftbloom2")


def _bloom_serialize_keys(frame, key_cols: list[str]):
    """One string per row from the key columns, '\\x1f'-joined.

    Only defined for all-string keys (the builder refuses other types):
    stringifying e.g. int64 vs float probes can disagree ('5' vs '5.0')
    and a serialization mismatch would be a FALSE NEGATIVE — a wrongly
    pruned file — so non-string keys simply don't get blooms."""
    s = frame[key_cols[0]].astype("object").fillna("\x00")
    for c in key_cols[1:]:
        s = s + "\x1f" + frame[c].astype("object").fillna("\x00")
    return s


def _bloom_positions(keys, m_bits: int):
    """k bit positions per serialized key, fully vectorized
    (two independent siphash passes, double hashing)."""
    import numpy as np
    import pandas as pd

    h1 = pd.util.hash_pandas_object(
        keys, index=False, hash_key=_BLOOM_HASH_KEYS[0]
    ).to_numpy(dtype="uint64")
    h2 = pd.util.hash_pandas_object(
        keys, index=False, hash_key=_BLOOM_HASH_KEYS[1]
    ).to_numpy(dtype="uint64")
    i = np.arange(_BLOOM_K, dtype="uint64")[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


def _build_bloom_sidecar(path: str, key_cols: list[str]) -> dict | None:
    """Build a Bloom filter over this parquet file's key tuples and
    write it to ``<path>.bloom``; returns the manifest entry
    ``{"m": bits, "k": probes}`` or None when the file can't carry one
    (non-string key columns, unreadable file).

    Driver-side like the zone-map harvest, but unlike it this reads the
    key DATA pages (columns=key_cols only). That is the deliberate
    trade: ~1.25 bytes/key of sidecar buys point reads that skip the
    hash-ordered delta files zone maps cannot prune (every un-compacted
    file's key range spans the whole bucket). Off by default
    (``collect_blooms=False``) — enable on lookup-serving tables."""
    import numpy as np

    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        if not all(
            str(pf.schema_arrow.field(c).type) in ("string", "large_string")
            for c in key_cols
        ):
            return None
        frame = pf.read(columns=key_cols).to_pandas()
    except Exception:
        return None
    n = max(len(frame), 1)
    m_bits = 1 << max(10, (n * _BLOOM_BITS_PER_KEY - 1).bit_length())
    pos = _bloom_positions(_bloom_serialize_keys(frame, key_cols), m_bits)
    bits = np.zeros(m_bits // 8, dtype="uint8")
    np.bitwise_or.at(
        bits,
        (pos >> np.uint64(3)).astype("int64").ravel(),
        (np.uint64(1) << (pos % np.uint64(8))).astype("uint8").ravel(),
    )
    with open(path + ".bloom", "wb") as f:
        f.write(bits.tobytes())
    return {"m": m_bits, "k": _BLOOM_K}


def _bloom_probe_hashes(key_cols: list[str], key: dict):
    """The probe's two 64-bit hashes, computed ONCE per lookup (they
    depend only on the key — each candidate file just reduces them mod
    its own m). None when any probe value isn't a string (builders
    refuse non-string keys, so there is nothing to probe)."""
    import pandas as pd

    if any(not isinstance(key[c], str) for c in key_cols):
        return None
    probe = pd.DataFrame({c: [key[c]] for c in key_cols})
    keys = _bloom_serialize_keys(probe, key_cols)
    return tuple(
        pd.util.hash_pandas_object(keys, index=False, hash_key=hk).to_numpy(
            dtype="uint64"
        )[0]
        for hk in _BLOOM_HASH_KEYS
    )


def _bloom_maybe_contains(path: str, meta: dict | None, hashes) -> bool:
    """False only when the sidecar PROVES the key tuple is absent.
    Missing/odd/negative-marker sidecar metadata means 'maybe' —
    pruning stays exact."""
    import numpy as np

    if not meta or not meta.get("m") or hashes is None:
        return True
    try:
        with open(path + ".bloom", "rb") as f:
            bits = np.frombuffer(f.read(), dtype="uint8")
    except OSError:
        return True
    if len(bits) * 8 != meta["m"]:
        return True
    h1, h2 = (np.uint64(h) for h in hashes)
    i = np.arange(_BLOOM_K, dtype="uint64")
    pos = (h1 + i * h2) % np.uint64(meta["m"])
    byte = (pos >> np.uint64(3)).astype("int64")
    mask = (np.uint64(1) << (pos % np.uint64(8))).astype("uint8")
    return bool(np.all(bits[byte] & mask))


#: supported where-condition operators -> (stats-prune test, Column op)
_PRUNE_OPS = {
    "==": lambda mn, mx, v: mn <= v <= mx,
    ">=": lambda mn, mx, v: mx >= v,
    ">": lambda mn, mx, v: mx > v,
    "<=": lambda mn, mx, v: mn <= v,
    "<": lambda mn, mx, v: mn < v,
    # membership: a file can match iff ANY listed value falls in its
    # range — the multi-point probe a delta-join's "which fact rows
    # reference these changed dims" read needs. The scan survives only
    # files overlapping at least one value.
    "in": lambda mn, mx, vs: any(mn <= v <= mx for v in vs),
}


def _same_kind(val, mn) -> bool:
    return (
        isinstance(val, (int, float))
        and isinstance(mn, (int, float))
        and not isinstance(val, bool)
    ) or (isinstance(val, str) and isinstance(mn, str))




def _harvest_dense_obs(obs, n_upd):
    """Dense-mode Observation harvest shared by the COW and MoR commit
    paths: (n_updates, {min_lsn, max_lsn}) — with the
    observation-pruned fallback (an empty observed subtree Catalyst
    proved away reads as zero updates, not an error). One
    implementation so a metrics-contract change can never leave the
    two merge strategies recording different lineage for the same
    batch shape."""
    dense_lsn_range: dict = {}
    if n_upd is None and obs is not None:
        try:
            n_upd = int(obs.get["n_updates"])
            got = obs.get
            if got.get("max_lsn") is not None:
                dense_lsn_range = {
                    "min_lsn": int(got["min_lsn"]),
                    "max_lsn": int(got["max_lsn"]),
                }
        except Exception as exc:
            if observation_pruned(exc):
                n_upd = 0  # observed subtree was provably empty
    return n_upd, dense_lsn_range

def _list_written(out_dir: str, rel_dir: str) -> dict[int, list[str]]:
    """Bucket-partitioned writer output -> {bucket: sorted rel paths}.
    THE walk every commit path (merge, append, compact, rescale) uses
    to turn what the writer actually produced into manifest entries —
    one implementation, so a layout change (new sidecar, marker file,
    compression suffix) can never desynchronize one commit path's
    manifest from the files on disk."""
    written: dict[int, list[str]] = {}
    if not os.path.isdir(out_dir):
        return written
    for entry in sorted(os.listdir(out_dir)):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        b = int(entry.split("=", 1)[1])
        bdir = os.path.join(out_dir, entry)
        files = sorted(
            os.path.join(rel_dir, entry, fn)
            for fn in os.listdir(bdir)
            if fn.endswith(".parquet")
        )
        if files:
            written[b] = files
    return written

def _file_matches(stats: dict, where) -> bool:
    """Can this file contain a row satisfying ALL conditions? (The
    caller pre-filters ``where`` down to prune-safe conditions.)
    Missing or type-mismatched stats mean 'maybe' (keep). Parquet
    min/max exclude nulls, and null values never satisfy these
    operators, so range pruning is exact."""
    for col, op, val in where:
        rng = stats.get(col)
        if rng is None or not isinstance(rng, (list, tuple)):
            continue  # absent, or a non-range entry (e.g. __rows)
        mn, mx = rng
        if op == "in":
            # prune only when EVERY value is comparable to the stats
            # and none falls in range; a single non-comparable value
            # means 'maybe' (keep)
            vals = list(val)
            if any(not _same_kind(v, mn) for v in vals):
                continue
            if not _PRUNE_OPS[op](mn, mx, vals):
                return False
            continue
        if not _same_kind(val, mn):
            continue
        if not _PRUNE_OPS[op](mn, mx, val):
            return False
    return True


def _zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 6,
    sample_rows: int = 20_000,
    total_rows: int | None = None,
):
    """Interleaved-bit (Morton / z-order) sort expression over
    range-bucketed columns — the Delta ``OPTIMIZE ZORDER BY`` layout
    analog for multi-dimensional zone-map pruning.

    A lexicographic sort only tightens zone maps on the LEADING sort
    column; predicates on the second column still touch every file.
    Z-ordering buckets each column into ``2**bits`` cells by sampled
    range boundaries (the same bounded-sample technique Spark's own
    RangePartitioner uses, so it works for ANY orderable type — ints,
    doubles, strings, dates) and interleaves the cell ids' bits: rows
    close in the z-key are close in EVERY clustered dimension and each
    written file covers a narrow min/max range on all of them.

    Everything row-side is pure codegen'd Column expressions: the cell
    id is a fold over the literal cut array (count of cuts <= value,
    in the column's OWN comparison order; NULLs land in cell 0 =
    nulls-first), the interleave is shift/and/or terms. No shuffle, no
    Python, no extra exchange. Driver-side cost is one bounded sample
    job (<= ``sample_rows`` rows across all columns). The layout
    choice is maintenance metadata, not data: sampled cuts may vary
    with the seed's view of the data, content never does."""
    if not 1 <= bits <= 12:
        raise ValueError("zorder bits must be in [1, 12]")
    # the interleave must fit a signed long: Spark's shiftleft masks
    # the shift amount mod 64 (Java semantics), so an overflowing
    # position would silently WRAP high-column cells onto low bit
    # positions and scramble the layout. Clamp bits instead — coarser
    # cells, never a corrupt key.
    bits = max(1, min(bits, 63 // max(len(cols), 1)))
    n_cells = 1 << bits
    if total_rows is None:
        total_rows = df.count()
    frac = min(1.0, sample_rows / max(total_rows, 1))
    sampled = df.select(*cols).sample(False, frac, seed=42).collect()
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        vals = sorted(v for v in (r[c] for r in sampled) if v is not None)
        # de-duplicated evenly-spaced boundaries; an all-null or
        # constant column yields no cuts and contributes nothing
        cuts = sorted({
            vals[(len(vals) * k) // n_cells] for k in range(1, n_cells)
        }) if vals else []
        if not cuts:
            continue
        v = F.col(c)
        cell = F.aggregate(
            F.lit(cuts),
            F.lit(0),
            lambda acc, x: acc
            + F.when(v >= x, F.lit(1)).otherwise(F.lit(0)),
        )
        for j in range(bits):
            bit = F.shiftright(cell, j).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + i))
    return z


@dataclass
class LakeTable:
    root: str
    key_cols: list[str] = field(default_factory=lambda: ["repo", "path"])
    n_buckets: int = 64
    target_rows_per_file: int = 2_000_000
    #: True: run a small discovery job first so the merge reads/rewrites
    #: ONLY touched buckets (sparse updates — the 100 TB default).
    #: False: assume every bucket is touched (dense updates, e.g. zipf
    #: key coverage ≫ n_buckets) — saves one job + a persist per batch;
    #: lineage comes from an Observation on the write job instead.
    discovery: bool = True
    #: merge join strategy. "shuffle": full_outer join (works at any
    #: update size — both sides exchange on key). "broadcast": the
    #: post-LWW update set is broadcast and the target flows scan ->
    #: anti-join -> write with NO exchange at all — the right shape
    #: whenever a batch's distinct-key set fits in memory (even at
    #: 100 TB *table* size, since cost scales with the update set, not
    #: the table). "append": merge-on-read — each batch only APPENDS its
    #: updates (deletes as ``_deleted`` marker rows); reads resolve LWW
    #: by ``_lsn`` per key and compaction folds deltas into the base
    #: (Hudi-MoR/Paimon shape). Write amplification O(batch) instead of
    #: O(touched buckets) — the high-ingest-rate choice; reads pay one
    #: aggregate until compaction.
    merge_strategy: str = "shuffle"
    #: harvest per-file column min/max zone maps (from parquet footers,
    #: driver-side, no extra job) into the manifest at every commit;
    #: ``read(where=...)`` and ``lookup`` use them for file skipping —
    #: the Iceberg manifest-stats analog. None-cost to disable.
    collect_stats: bool = True
    #: restrict harvested stats to these columns (None = every
    #: top-level primitive column the footers cover)
    stats_cols: list[str] | None = None
    #: build a per-file Bloom sidecar over the key tuple at every
    #: commit (driver-side read of the key columns of NEW files only).
    #: Point lookups then skip files the filter proves key-free —
    #: covering the hash-ordered delta files whose zone maps span the
    #: whole bucket. Off by default: it reads key data pages at commit
    #: time, which only pays for itself on lookup-serving tables.
    collect_blooms: bool = False
    #: schema policy for merges. "evolve" (default): new update columns
    #: join the table schema additively (north_star: added columns
    #: propagate automatically). "strict": a batch whose update rows
    #: carry columns the table lacks FAILS pre-write (Delta schema
    #: enforcement analog) — for production tables where an upstream
    #: schema change must be an explicit migration, not a side effect.
    schema_mode: str = "evolve"
    #: emit a row-level changelog with pre/post images at every merge
    #: (the Delta CDF / Iceberg changelog-view analog): each batch
    #: writes ``_changes/epoch=<e>/batch_id=<b>/`` rows tagged
    #: ``_change_type`` ∈ {insert, update_preimage, update_postimage,
    #: delete}. This is what ``read_changes`` cannot reconstruct from
    #: COW commits — and what incremental view maintenance downstream
    #: needs (retract old, add new). Costs ONE extra bucket-pruned
    #: read of the touched target keys per batch; off by default.
    changelog: bool = False
    #: multi-writer optimistic concurrency: when another writer claims
    #: the manifest version this merge predicted, the commit first
    #: tries a REBASE (cheap, metadata-only — valid whenever the
    #: interleaved commits did not invalidate what this merge read, see
    #: ``_publish_commit``), then falls back to re-running the whole
    #: merge against the new head, up to this many times total before
    #: CommitConflictException surfaces to the caller, with jittered
    #: exponential backoff between re-runs so N contending writers
    #: serialize instead of livelocking (every re-run makes global
    #: progress — SOME writer committed — so the backlog drains). 0
    #: restores the fail-fast single-writer behavior.
    max_commit_retries: int = 8
    #: how long an UNREADABLE (torn/legacy) manifest-slot claim must
    #: sit before another writer may reclaim the version slot. The
    #: link protocol never leaves partial claims, so unreadable slots
    #: are crash debris — but a conservative window still guards
    #: against clock skew and slow filesystems. A conflicting writer
    #: WAITS OUT the remainder of this window in-place (bounded sleep)
    #: rather than burning whole-job merge retries against a slot that
    #: was about to become reclaimable.
    reclaim_grace_seconds: float = 60.0

    def __post_init__(self):
        if self.schema_mode not in ("evolve", "strict"):
            raise ValueError("schema_mode must be 'evolve' or 'strict'")
        os.makedirs(os.path.join(self.root, "_manifest"), exist_ok=True)
        # the manifest is authoritative for the physical layout: opening
        # an existing table with different n_buckets/key_cols would
        # silently mis-bucket merges (discovery would prune the WRONG
        # target files and duplicate keys), so adopt the stored values
        m = self.manifest()
        if m.get("n_buckets") and m["n_buckets"] != self.n_buckets:
            _sink_log.warning(
                "table %s was created with n_buckets=%s; overriding the "
                "requested %s (use rescale() to change bucketing)",
                self.root, m["n_buckets"], self.n_buckets,
            )
            self.n_buckets = m["n_buckets"]
        if m.get("key_cols") and m["key_cols"] != self.key_cols:
            _sink_log.warning(
                "table %s was created with key_cols=%s; overriding the "
                "requested %s",
                self.root, m["key_cols"], self.key_cols,
            )
            self.key_cols = m["key_cols"]
        # change capture is a TABLE property, not a handle option: once
        # any commit captured changes, every later handle must keep
        # capturing (a maintenance invocation without the flag would
        # otherwise silently punch holes in the changelog)
        if m.get("changelog") and not self.changelog:
            self.changelog = True

    # ------------------------------------------------------------ manifest

    def _abs(self, path: str) -> str:
        """Manifests store ROOT-RELATIVE data-file paths, so a table is
        relocatable: copy/move/mount the directory tree anywhere and
        open it at the new root — clone-by-copy, DR restore to a
        different prefix, test fixtures. Absolute entries (manifests
        written before this convention, or files deliberately outside
        the root) pass through untouched."""
        return path if os.path.isabs(path) else os.path.join(self.root, path)

    @property
    def _current_path(self) -> str:
        return os.path.join(self.root, "_manifest", "CURRENT")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_manifest", f"manifest-{version:08d}.json")

    _EMPTY_MANIFEST: ClassVar[dict[str, Any]] = {
        "version": 0,
        "buckets": {},
        "committed": [],
        "lineage": [],
        "schema": None,
    }

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        """CURRENT manifest, or a historical one (time travel — retained
        until ``vacuum`` expires it). Version 0 is the virtual empty
        table (no manifest file exists for it — the first commit writes
        version 1), so since_version=0 means 'everything'.

        Multi-writer (OCC) contract: the COMMIT is the durable
        exclusive creation of ``manifest-vN`` (``_swap``'s O_EXCL
        claim); the CURRENT pointer is only a cache of the head. A
        writer that crashed between its claim and the repoint must not
        lose its commit, so head resolution rolls FORWARD from CURRENT
        over contiguous valid claims (a partially-written claim fails
        JSON parse and stops the walk — its claimer either finishes it
        or a later writer reclaims the slot). The walk is one cheap
        driver-side stat per step beyond the head, i.e. usually zero."""
        if version is not None:
            if version == 0:
                return dict(self._EMPTY_MANIFEST)
            with open(self._manifest_path(version)) as f:
                return json.load(f)
        head = None
        if os.path.exists(self._current_path):
            with open(self._current_path) as f:
                version = int(f.read().strip())
            try:
                with open(self._manifest_path(version)) as f:
                    head = json.load(f)
            except FileNotFoundError:
                # CURRENT lagged behind a claim (crash window) long
                # enough for retention to expire its target — the walk
                # below must find the newer head, else corrupt
                pass
        else:
            version = 0
        start = version
        while True:
            nxt = self._manifest_path(version + 1)
            if not os.path.exists(nxt):
                break
            try:
                with open(nxt) as f:
                    candidate = json.load(f)
            except (json.JSONDecodeError, OSError):
                break  # in-flight or torn claim: not yet a commit
            if "committed" not in candidate:
                break
            head, version = candidate, version + 1
        if head is None:
            if start > 0:
                raise FileNotFoundError(
                    f"CURRENT points at expired manifest version {start} "
                    f"and no later claim exists: {self.root}"
                )
            return dict(self._EMPTY_MANIFEST)
        if version > start:
            # heal the pointer (best-effort: a read-only mount stays
            # consistent through the walk alone; a racing newer repoint
            # it momentarily overwrites is re-resolved by the next walk)
            try:
                tmp = self._current_path + f".tmp-{uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    f.write(str(version))
                os.replace(tmp, self._current_path)
            except OSError:
                pass
        return head

    def _attach_stats(
        self, manifest: dict[str, Any], prev_manifest: dict[str, Any]
    ) -> None:
        """Zone maps ride every commit (merge, append, compact,
        rescale, ledger-only): stats for files surviving from the prior
        version carry forward, new files get their footers harvested —
        incremental, so each commit pays only for the files it wrote.

        With the flag OFF, entries another process built are still
        filtered down to this commit's live files — never rebuilt, but
        never carried forward for deleted files either (a stale dict
        would bloat every later manifest and misstate coverage).

        New files harvest CONCURRENTLY (thread pool): each footer read
        is ~tens of ms of pyarrow I/O+parse that releases the GIL, and
        a COW merge commits O(touched buckets) new files — serially
        that was a measurable per-commit driver stall (~0.75 s/batch at
        16 buckets in the replay profile), pure latency for no
        ordering benefit."""
        prev = prev_manifest.get("file_stats") or {}
        if not self.collect_stats:
            if prev:
                manifest["file_stats"] = {
                    f: prev[f]
                    for fs in manifest["buckets"].values()
                    for f in fs
                    if f in prev
                }
            return
        live = [f for fs in manifest["buckets"].values() for f in fs]
        harvested = _concurrent_map(
            [f for f in live if f not in prev],
            lambda f: _harvest_file_stats(self._abs(f), self.stats_cols),
        )
        manifest["file_stats"] = {
            f: (prev[f] if f in prev else harvested[f]) for f in live
        }

    def _attach_blooms(
        self, manifest: dict[str, Any], prev_manifest: dict[str, Any]
    ) -> None:
        """Bloom sidecars ride commits the same incremental way as zone
        maps: entries for surviving files carry forward, only files new
        to this commit get built. A file that CANNOT carry a bloom
        (non-string keys, unreadable) is memoized as the negative
        marker ``{"m": 0}`` so later commits don't re-open it; the
        probe treats the marker as 'maybe'. Flag-off behavior mirrors
        ``_attach_stats``: filter, never rebuild."""
        prev = prev_manifest.get("file_blooms") or {}
        if not self.collect_blooms:
            if prev:
                manifest["file_blooms"] = {
                    f: prev[f]
                    for fs in manifest["buckets"].values()
                    for f in fs
                    if f in prev
                }
            return
        live = [f for fs in manifest["buckets"].values() for f in fs]
        # same concurrency rationale as _attach_stats (bloom builds
        # additionally read key data pages, so they are slower)
        built = _concurrent_map(
            [f for f in live if prev.get(f) is None],
            lambda f: _build_bloom_sidecar(self._abs(f), self.key_cols)
            or {"m": 0},
        )
        manifest["file_blooms"] = {
            f: (built[f] if f in built else prev[f]) for f in live
        }

    def _swap(
        self, manifest: dict[str, Any], *, op: list | None = None
    ) -> dict[str, Any]:
        """Write the new manifest, then atomically repoint CURRENT.
        Returns the manifest that actually holds the claimed slot —
        ours, or an adopted equivalent commit (see below).

        Optimistic concurrency: the claim is an atomic hard-link of a
        fully-written temp file into the manifest-vN slot — two writers
        that both built against version N-1 race the link, exactly one
        wins, the loser gets CommitConflictException and rebases or
        replays (safe under the exactly-once ledger). Because the slot
        is only ever populated by a COMPLETE file, a live claimer can
        never be mistaken for a torn crash and reclaimed out from
        under (the old O_EXCL + in-place json.dump had exactly that
        window). The CURRENT repoint then belongs to the link winner.

        ``op`` is the LOGICAL identity of this commit (e.g.
        ``["batch", epoch, batch_id]``, ``["rescale", 128]``); it is
        stamped into the manifest and a racing claim is only ADOPTED
        when both its ledger tail and its op identity equal ours.
        The ledger tail alone is not enough: maintenance and tag
        commits append no ledger entry, so a compact and a rescale
        racing from the same base have identical tails — adopting
        across that pair would make the rescale loser report success
        (and re-bucket its future merges) under a bucket count the
        committed manifest does not have."""
        prev = self.manifest()  # read once, shared by both attach passes
        self._attach_stats(manifest, prev)
        self._attach_blooms(manifest, prev)
        # exact table-level row count for COW tables: sum of the
        # per-file footer counts riding the zone maps. The per-commit
        # Observation only sees the rows the merge WROTE — on a sparse
        # (discovery) merge that is the touched buckets, so recording
        # it as the table total collapsed stats()/file-sizing/zorder
        # sampling to a fraction of the truth. MoR tables keep the
        # documented approximation (physical rows ≠ logical rows until
        # compaction folds deltas).
        fs = manifest.get("file_stats") or {}
        live = [f for fls in manifest["buckets"].values() for f in fls]
        if not manifest.get("mor") and all(
            isinstance(fs.get(f, {}).get("__rows"), int) for f in live
        ):
            manifest.setdefault("stats", {})
            manifest["stats"]["total_rows"] = sum(
                fs[f]["__rows"] for f in live
            )
        # overwrite unconditionally: builders dict-copy the base, so a
        # stale op/uuid inherited from the previous commit must not leak
        manifest["op"] = op
        manifest["commit_uuid"] = uuid.uuid4().hex
        version = manifest["version"]
        tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError:
            # someone already claimed this version. Three cases:
            # (a) same logical commit (same ledger tail AND same op
            #     identity) — a previous attempt of THIS batch crashed
            #     between manifest write and the CURRENT repoint, or a
            #     concurrent replayer of the same batch won: ADOPT it
            #     (idempotent) and finish the repoint; our freshly-
            #     written data files become orphans for vacuum.
            # (b) a corrupt slot (legacy torn write, damaged disk):
            #     reclaim it — but only after a grace period, since the
            #     link protocol itself never leaves partial claims.
            # (c) a DIFFERENT batch's commit — a true conflict: raise,
            #     the caller rebases or replays.
            existing = self._read_slot(version)
            adoptable = (
                existing is not None
                and op is not None
                and existing.get("committed") == manifest["committed"]
                and existing.get("op") == op
            )
            if adoptable:
                # candidate for (a) — but only adopt a manifest whose
                # data files still exist (a vacuumed-away stale claim
                # must not be repointed to). Ours references the files
                # we just wrote; reclaim with it instead.
                if any(
                    not os.path.exists(self._abs(f))
                    for fs in existing.get("buckets", {}).values()
                    for f in fs
                ):
                    existing = None  # stale claim over destroyed files
                    adoptable = False
            if existing is None:  # (b) corrupt/stale slot
                # wait out the remaining reclaim grace in-place instead
                # of raising: a merge-level retry re-runs the whole
                # Spark job, and the jittered backoff budget for all
                # retries can sum to LESS than the grace window — a
                # healthy writer could exhaust its retries against a
                # slot that was about to become reclaimable anyway.
                # With the link protocol a valid claim is never
                # partial, so an unreadable slot only becomes readable
                # via reclaim; sleeping here is safe and bounded.
                while True:
                    try:
                        age = time.time() - os.path.getmtime(
                            self._manifest_path(version)
                        )
                    except OSError:
                        break  # slot vanished — retry the link below
                    remaining = self.reclaim_grace_seconds - age
                    if remaining <= 0:
                        break
                    time.sleep(min(remaining + 0.05, 1.0))
                    fresh = self._read_slot(version)
                    if fresh is not None:
                        # the slot was reclaimed by someone else with a
                        # VALID commit while we waited — re-judge it
                        os.remove(tmp)
                        from transforms_for_apache_kafka_connect_spark.errors import (  # noqa: E501
                            CommitConflictException,
                        )

                        raise CommitConflictException(
                            f"version {version} slot was claimed while "
                            f"waiting out the reclaim grace; retrying"
                        ) from None
                # exclusive reclaim: RENAME the stale content away
                # first — exactly ONE reclaimer wins the rename, so two
                # writers whose grace expired simultaneously can never
                # both replace into the slot and silently destroy each
                # other's just-committed manifest (the old os.replace
                # path had exactly that window). The loser (or anyone
                # racing a fresh claim) falls through to the link and
                # gets a clean conflict to re-judge.
                stale_away = (
                    self._manifest_path(version)
                    + f".stale-{uuid.uuid4().hex}"
                )
                try:
                    os.rename(self._manifest_path(version), stale_away)
                    os.remove(stale_away)
                except OSError:
                    pass  # already claimed away by another reclaimer
                try:
                    os.link(tmp, self._manifest_path(version))
                except FileExistsError:
                    os.remove(tmp)
                    from transforms_for_apache_kafka_connect_spark.errors import (  # noqa: E501
                        CommitConflictException,
                    )

                    raise CommitConflictException(
                        f"version {version} slot was re-claimed "
                        f"while reclaiming; retrying"
                    ) from None
                os.remove(tmp)
                tmp = None
            elif not adoptable:
                os.remove(tmp)
                from transforms_for_apache_kafka_connect_spark.errors import (
                    CommitConflictException,
                )

                raise CommitConflictException(
                    f"version {version} was already committed by another "
                    f"writer; re-read the table and replay the batch"
                ) from None
            else:
                # (a): repoint to the adopted manifest and report IT as
                # the committed state (its data files, not ours, are
                # what the table now holds)
                manifest = existing
        if tmp is not None and os.path.exists(tmp):
            os.remove(tmp)
        tmp = self._current_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_path)  # atomic on POSIX
        return manifest

    def _read_slot(self, version: int) -> dict[str, Any] | None:
        """A manifest slot's contents iff it holds a complete, valid
        commit; None for torn/absent/non-commit contents."""
        try:
            with open(self._manifest_path(version)) as f:
                existing = json.load(f)
        except (json.JSONDecodeError, OSError):
            return None
        return existing if "committed" in existing else None

    def _publish_commit(
        self, build, base: dict[str, Any], can_rebase, *,
        epoch: str, batch_id: int, op: list | None = None,
    ) -> dict[str, Any] | None:
        """OCC commit loop: claim the version ``build(base)`` predicts;
        on a claim conflict, re-resolve the head and — if ``can_rebase
        (base, head)`` proves the interleaved commits did not
        invalidate anything this merge READ — rebuild the manifest on
        top of the head (``build(head)``, a pure function of its base)
        and claim again. The data files were already written to this
        attempt's unique directory, so a rebase is metadata-only: no
        Spark job re-runs.

        Returns the committed manifest, ``None`` when a concurrent
        replayer of the SAME (epoch, batch_id) won (the caller reports
        a ledger skip), and raises CommitConflictException when the
        head moved in a way that invalidates the written files (the
        merge-level retry then re-runs the job against the new head).
        """
        from transforms_for_apache_kafka_connect_spark.errors import (
            CommitConflictException,
        )

        if op is None:
            op = ["batch", epoch, batch_id]
        m = base
        commit = build(m)
        # rebase attempts are metadata-only and each conflict means
        # another writer made real progress; still bound the loop so a
        # pathological livelock surfaces loudly. max_commit_retries=0
        # = documented fail-fast single-writer mode: no rebasing either.
        for _ in range(self.max_commit_retries + 1):
            try:
                # adoption inside _swap may substitute an equivalent
                # winner's manifest — report THAT as the commit
                return self._swap(commit, op=op)
            except CommitConflictException:
                head = self.manifest()
                if [epoch, batch_id] in head["committed"]:
                    return None  # a concurrent replayer of this batch won
                if (
                    self.max_commit_retries == 0
                    or head["version"] <= m["version"]
                    or not can_rebase(m, head)
                ):
                    raise
                m = head
                commit = build(m)
        raise CommitConflictException(
            f"gave up after {self.max_commit_retries} rebase attempts "
            f"on {self.root} (epoch={epoch}, batch_id={batch_id})"
        )

    def _rebase_guard(self, base: dict[str, Any], head: dict[str, Any],
                      read_buckets: list[int] | None, *,
                      check_schema: bool = True) -> bool:
        """True iff a commit computed against ``base`` is still valid
        on top of ``head``: same physical layout, no concurrent schema
        evolution (type widening on the head could make files written
        against the base narrower than untouched buckets expect), and
        every bucket this merge READ is byte-identical between the two
        manifests (``read_buckets=None`` = it read all of them;
        ``check_schema=False`` for commits whose build recomputes the
        schema union against the new base and wrote no data files)."""
        if head.get("n_buckets", self.n_buckets) != self.n_buckets:
            return False
        if head.get("key_cols", self.key_cols) != self.key_cols:
            return False
        if check_schema and head.get("schema") != base.get("schema"):
            return False
        hb, bb = head["buckets"], base["buckets"]
        if read_buckets is None:
            return hb == bb
        return all(hb.get(str(b)) == bb.get(str(b)) for b in read_buckets)

    # -------------------------------------------------- write-audit-publish

    def _stage(
        self, manifest: dict[str, Any], occ: dict[str, Any] | None = None
    ) -> str:
        """WAP: write the commit as a STAGED manifest (no CURRENT move,
        no version claim). Data files are already on disk; the staged
        token can be audited with ``read_staged`` and made live with
        ``publish`` — or abandoned (``vacuum`` reclaims the orphaned
        files; do not vacuum while an audit is in flight).

        ``occ`` records the stage's read-set provenance (mode, read
        buckets, their base file lists, base schema, appended files,
        lineage watermark, extra delta) — self-contained, so
        ``publish`` can REBASE the stage over commits that landed
        during the audit without needing the base manifest to still
        exist (it may be vacuumed)."""
        prev = self.manifest()
        self._attach_stats(manifest, prev)
        self._attach_blooms(manifest, prev)
        token = f"staged-{uuid.uuid4().hex}"
        with open(os.path.join(self.root, "_manifest", f"{token}.json"), "w") as f:
            json.dump(manifest, f)
        if occ is not None:
            # provenance SIDECAR (not inside the manifest: the happy
            # publish path hard-links the staged file as the committed
            # manifest, which must stay provenance-free)
            with open(self._occ_sidecar_path(token), "w") as f:
                json.dump(occ, f)
        return token

    def _occ_sidecar_path(self, token: str) -> str:
        return os.path.join(self.root, "_manifest", f"occ-{token}.json")

    def _stage_occ(
        self, m: dict[str, Any], *, mode: str,
        read_buckets: list[int] | None,
        appended: dict[str, list[str]] | None = None,
        manifest_extra: dict[str, Any] | None = None,
        staged_commit: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Build the ``_occ`` provenance block for ``_stage``."""
        if read_buckets is None:
            base_buckets = m["buckets"]
        else:
            base_buckets = {
                str(b): m["buckets"].get(str(b))
                for b in read_buckets
            }
        # columns this stage ADDED over its base (ledger-mode rebases
        # must re-union them onto the head's schema, not resurrect the
        # stage-time copy — the head may have evolved during the audit)
        schema_add = []
        if staged_commit is not None and staged_commit.get("schema"):
            base_names = {
                f["name"] for f in (m["schema"] or {"fields": []})["fields"]
            }
            schema_add = [
                f for f in staged_commit["schema"]["fields"]
                if f["name"] not in base_names
            ]
        return {
            "mode": mode,
            "read_buckets": read_buckets,
            "base_buckets": base_buckets,
            "base_schema": m["schema"],
            "base_total_rows": (m.get("stats") or {}).get("total_rows", 0),
            "n_base_lineage": len(m["lineage"]),
            "appended": appended or {},
            "extra_delta": manifest_extra or {},
            "schema_add": schema_add,
        }

    def read_staged(self, spark: SparkSession, token: str, **kwargs) -> DataFrame:
        """Audit read of a staged (unpublished) commit."""
        return self.read(spark, _manifest=self._staged_manifest(token), **kwargs)

    def _staged_manifest(self, token: str) -> dict[str, Any]:
        with open(os.path.join(self.root, "_manifest", f"{token}.json")) as f:
            return json.load(f)

    def publish(self, token: str) -> dict[str, Any]:
        """Make a staged commit live: claim its version with an atomic
        exclusive link (the same optimistic-concurrency gate as
        ``_swap``), then repoint CURRENT.

        If another writer advanced the table during the audit, the
        stage REBASES like any OCC commit: its ``_stage``-recorded
        provenance sidecar carries the read set (mode, read buckets,
        their base file lists, base schema), so publish can verify the
        interleaved commits stayed out of what the staged merge read
        and rebuild the manifest on the new head — metadata-only, no
        job re-runs, which matters because a transaction coordinator
        (txn.py) calls publish long after the Spark work is done. An
        invalidated read set (or a pre-provenance stage) still raises
        CommitConflictException and the stage must be redone."""
        from transforms_for_apache_kafka_connect_spark.errors import (
            CommitConflictException,
        )

        staged_path = os.path.join(self.root, "_manifest", f"{token}.json")
        m = self._staged_manifest(token)
        version = m["version"]
        head = self.manifest()
        if head["version"] + 1 != version:
            # the predicted slot is NOT the next version: either the
            # table advanced during the audit (rebase), or — after a
            # long audit — vacuum expired the slot's manifest and a
            # blind link would SUCCEED into the freed slot and roll the
            # whole table back to the stage's base. Never link unless
            # the claim extends the current chain.
            return self._publish_rebased(token, staged_path, m)
        try:
            os.link(staged_path, self._manifest_path(version))
        except FileExistsError:
            # same adoption rule as _swap: a previous publish of this
            # very token may have crashed between the link and the
            # CURRENT repoint — same ledger tail means same commit,
            # finish the repoint; anything else goes to the rebase path
            try:
                with open(self._manifest_path(version)) as f:
                    existing = json.load(f)
            except (json.JSONDecodeError, OSError):
                existing = None
            if existing is None or existing.get("committed") != m["committed"]:
                return self._publish_rebased(token, staged_path, m)
        tmp = self._current_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_path)
        # sidecar BEFORE staged file: a crash in between leaves the
        # staged manifest, whose retry goes through the same-tail
        # adoption / already-landed checks (idempotent); the reverse
        # order would strand a sidecar whose publish can't be retried
        sidecar = self._occ_sidecar_path(token)
        if os.path.exists(sidecar):
            os.remove(sidecar)
        os.remove(staged_path)
        return {"published": True, "version": version}

    def _publish_rebased(
        self, token: str, staged_path: str, staged: dict[str, Any]
    ) -> dict[str, Any]:
        """Rebase-and-claim loop for a stage whose predicted version was
        taken (see ``publish``). Validity is always judged against the
        ORIGINAL base recorded in the provenance sidecar — each fresh
        head must leave the staged merge's read set untouched."""
        from transforms_for_apache_kafka_connect_spark.errors import (
            CommitConflictException,
        )

        conflict = CommitConflictException(
            f"version {staged['version']} was committed by another "
            f"writer while this stage was under audit, and the staged "
            f"commit cannot be rebased; re-stage against the current "
            f"table"
        )
        sidecar = self._occ_sidecar_path(token)
        ledger_entry = staged["committed"][-1]

        def cleanup():
            if os.path.exists(sidecar):
                os.remove(sidecar)
            os.remove(staged_path)

        # already-landed check BEFORE requiring the sidecar: a publish
        # retried after a crash mid-cleanup (or a concurrent publisher
        # of the same batch) must complete idempotently even if the
        # provenance is already gone
        head0 = self.manifest()
        if ledger_entry in head0["committed"]:
            cleanup()
            return {
                "published": True,
                "version": head0["version"],
                "already": True,
            }
        if not os.path.exists(sidecar):
            raise conflict  # pre-provenance stage: detect-only behavior
        with open(sidecar) as f:
            occ = json.load(f)
        mode = occ["mode"]
        read_buckets = occ["read_buckets"]
        base_buckets = occ["base_buckets"]

        def guard(head):
            if head.get("n_buckets", self.n_buckets) != staged["n_buckets"]:
                return False
            if head.get("key_cols", self.key_cols) != staged["key_cols"]:
                return False
            if mode != "ledger" and head.get("schema") != occ["base_schema"]:
                return False
            if read_buckets is None:
                return head["buckets"] == base_buckets
            return all(
                head["buckets"].get(b) == fs
                for b, fs in base_buckets.items()
            )

        def build(head):
            commit = {k: v for k, v in staged.items()}
            # table-level fields must come from the HEAD (the stage's
            # copies are stale: a tag added/dropped or extra recorded
            # during the audit must survive the rebase)
            commit.pop("tags", None)
            commit.pop("extra", None)
            commit["version"] = head["version"] + 1
            if mode == "cow":
                if read_buckets is None:
                    nb = dict(staged["buckets"])
                else:
                    nb = dict(head["buckets"])
                    for b in read_buckets:
                        if str(b) in staged["buckets"]:
                            nb[str(b)] = staged["buckets"][str(b)]
                        else:
                            nb.pop(str(b), None)
            elif mode == "append":
                nb = dict(head["buckets"])
                for b, files in occ["appended"].items():
                    nb[b] = nb.get(b, []) + files
            else:  # ledger-only
                nb = dict(head["buckets"])
            commit["buckets"] = nb
            commit["committed"] = head["committed"] + [ledger_entry]
            commit["lineage"] = (
                head["lineage"] + staged["lineage"][occ["n_base_lineage"]:]
            )
            commit["mor"] = (
                True if mode == "append" else head.get("mor", False)
            )
            if mode == "ledger":
                # the cow/append guards pin head schema == base schema,
                # so the staged union stays valid; a ledger stage has
                # NO schema guard — re-union its additions onto the
                # head's schema instead of resurrecting the stale copy
                head_sch = head.get("schema")
                adds = [
                    f for f in occ.get("schema_add") or []
                    if head_sch is None
                    or f["name"] not in {x["name"] for x in head_sch["fields"]}
                ]
                if head_sch is None:
                    commit["schema"] = staged.get("schema")
                elif adds:
                    commit["schema"] = {
                        **head_sch, "fields": head_sch["fields"] + adds
                    }
                else:
                    commit["schema"] = head_sch
            # stats: carry the stage's DELTA onto the head's count, not
            # its stale absolute (interleaved commits changed the base)
            staged_total = (staged.get("stats") or {}).get("total_rows", 0)
            head_total = (head.get("stats") or {}).get("total_rows", 0)
            commit["stats"] = {
                "total_rows": max(
                    0,
                    head_total
                    + staged_total
                    - occ.get("base_total_rows", 0),
                )
            }
            self._carry_forward(commit, head, occ.get("extra_delta"))
            return commit

        for _ in range(self.max_commit_retries + 1):
            head = self.manifest()
            if ledger_entry in head["committed"]:
                # a crashed earlier publish of this token already
                # landed it (or a concurrent replayer of the same
                # batch won) — finish the cleanup, idempotently
                cleanup()
                return {
                    "published": True,
                    "version": head["version"],
                    "already": True,
                }
            if self.max_commit_retries == 0 or not guard(head):
                # retries=0 = documented fail-fast mode: never rebase
                raise conflict
            commit = build(head)
            try:
                self._swap(commit, op=["batch", *ledger_entry])
            except CommitConflictException:
                continue  # another claim raced in: re-resolve and retry
            cleanup()
            return {
                "published": True,
                "version": commit["version"],
                "rebased": True,
            }
        raise conflict

    # -------------------------------------------------------------- reads

    def committed(self, epoch: str, batch_id: int) -> bool:
        return [epoch, batch_id] in self.manifest()["committed"]

    def tag(self, name: str, version: int | None = None) -> dict[str, Any]:
        """Pin a manifest version under a name (Iceberg tag analog):
        ``read(tag=name)`` resolves it, and ``vacuum`` keeps the tagged
        version's manifest and data files alive regardless of the
        retention window — named, durable snapshots (audits, training
        runs pinned to exact data). Tagging is a metadata-only commit
        through the same atomic swap as everything else."""
        target0 = version

        def build(m):
            target = m["version"] if target0 is None else target0
            if not os.path.exists(self._manifest_path(target)):
                raise ValueError(f"no manifest version {target} to tag")
            commit = dict(m)
            commit["version"] = m["version"] + 1
            tags = dict(m.get("tags") or {})
            tags[name] = target
            commit["tags"] = tags
            return commit, target

        target = self._commit_tag_change(build, op_kind="tag", name=name)
        return {"tag": name, "pinned_version": target}

    def drop_tag(self, name: str) -> dict[str, Any]:
        """Remove a tag; the pinned version becomes vacuumable again."""

        def build(m):
            tags = dict(m.get("tags") or {})
            if name not in tags:
                raise ValueError(f"no such tag: {name!r}")
            pinned = tags.pop(name)
            commit = dict(m)
            commit["version"] = m["version"] + 1
            commit["tags"] = tags
            return commit, pinned

        pinned = self._commit_tag_change(build, op_kind="drop_tag", name=name)
        return {"dropped": name, "was_version": pinned}

    def _commit_tag_change(self, build, *, op_kind: str, name: str):
        """Tag commits are ledger-invariant AND trivially rebasable
        (they only touch the tags dict), so on any claim conflict just
        rebuild on the fresh head and retry — never adopt a racing
        commit that happens to share the ledger tail (it may be a
        DIFFERENT tag, a compact, or a rescale; adopting it would
        silently drop this tag change)."""
        from transforms_for_apache_kafka_connect_spark.errors import (
            CommitConflictException,
        )

        for _ in range(self.max_commit_retries + 1):
            commit, ret = build(self.manifest())
            try:
                # op includes the TARGET (pinned version / dropped
                # pin), not just name+version: two writers racing
                # tag('golden', 3) vs tag('golden', 7) from the same
                # head share name AND commit version, and adopting
                # across that pair would let the loser report a pin
                # that never landed (the next vacuum then collects
                # files it believes are pinned)
                self._swap(
                    commit, op=[op_kind, name, commit["version"], ret]
                )
                return ret
            except CommitConflictException:
                continue  # someone else committed: rebase on new head
        raise CommitConflictException(
            f"gave up after {self.max_commit_retries} retries committing "
            f"{op_kind} {name!r} on {self.root}"
        )

    def read(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        version: int | None = None,
        where: list[tuple] | None = None,
        tag: str | None = None,
        _manifest: dict[str, Any] | None = None,
        _point_keys: list[dict] | None = None,
    ) -> DataFrame:
        """Current table state, or a historical snapshot via ``version``
        (Iceberg time-travel analog; snapshots survive until vacuumed).

        ``where`` = conjunctive conditions ``[(col, op, value), ...]``
        with op in ``== >= > <= < in``: files whose manifest zone maps
        prove no row can match are skipped BEFORE the scan (driver-side
        — at 100 TB this is the difference between listing a slice and
        scanning the table), and the conditions are then applied as
        real filters so the result is exactly the matching rows.
        ``('col', 'in', values)`` takes a list/tuple/set of values (a
        bare string is rejected — it would silently explode into
        characters) and keeps a file if ANY value falls in its range —
        the multi-point probe a delta-join's "which rows reference
        these changed keys" read needs.

        Merge-on-read safety: before LWW resolution a key's versions
        may straddle files, so file skipping on a NON-key column could
        drop a newer version and resurrect an older one. On MoR tables
        three condition shapes prune files, everything else only
        filters after resolution:

        * key columns — constant per key, so a matching key keeps every
          file whose range covers it;
        * ``_lsn`` with ``>=`` / ``>`` — monotone in the resolution
          order: any pruned row has ``_lsn < X``; if the key's true
          winner satisfies the predicate its file survives (file max >=
          winner lsn >= X) and resolution is unchanged, and if it
          doesn't, the post-resolution filter drops the key either way.
          This is the shape that makes "recent changes" reads on MoR
          delta files (each covering one batch's tight LSN range) skip
          the cold files. The symmetric ``<=`` / ``<`` must NOT prune:
          skipping a newer version's file would resurrect a superseded
          or deleted row."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass either version or tag, not both")
            tags = self.manifest().get("tags") or {}
            if tag not in tags:
                raise ValueError(f"no such tag: {tag!r}")
            version = tags[tag]
        m = _manifest if _manifest is not None else self.manifest(version)
        if where:
            normalized = []
            for cond in where:
                if len(cond) != 3 or cond[1] not in _PRUNE_OPS:
                    raise ValueError(
                        f"where condition must be (col, op, value) with op "
                        f"in {sorted(_PRUNE_OPS)}: {cond!r}"
                    )
                col, op, val = cond
                if op == "in":
                    # reject scalars (a string would explode into
                    # characters) and materialize once so a generator
                    # is not consumed by the first file's prune test
                    if isinstance(val, (str, bytes)) or not hasattr(
                        val, "__iter__"
                    ):
                        raise ValueError(
                            f"'in' takes a list/tuple/set of values, got "
                            f"{type(val).__name__}: {val!r}"
                        )
                    val = list(val)
                normalized.append((col, op, val))
            where = normalized
        files = [
            f
            for b, fs in m["buckets"].items()
            if buckets is None or int(b) in buckets
            for f in fs
        ]
        n_candidates = len(files)
        if _point_keys:
            # batched point probes (lookup_many): a file survives if ANY
            # key could live in it — zone maps first, then Bloom
            # sidecars, both on key columns only (exact under MoR by the
            # same argument as single-key pruning)
            # gate on the MANIFEST's stats (same rule as blooms below):
            # a lookup-only process opened with collect_stats=False must
            # still benefit from zone maps an ingest process built
            fstats = m.get("file_stats") or {}
            fblooms = m.get("file_blooms") or {}
            key_conds = [
                [(c, "==", k[c]) for c in self.key_cols] for k in _point_keys
            ]
            key_hashes = [
                _bloom_probe_hashes(self.key_cols, k) for k in _point_keys
            ]

            def _any_key_survives(f: str) -> bool:
                st = fstats.get(f, {})
                bl = fblooms.get(f)
                abs_f = self._abs(f)
                for conds, hashes in zip(key_conds, key_hashes):
                    if not _file_matches(st, conds):
                        continue
                    if fblooms and not _bloom_maybe_contains(abs_f, bl, hashes):
                        continue
                    return True
                return False

            files = [f for f in files if _any_key_survives(f)]
        if where and m.get("file_stats"):
            fstats = m.get("file_stats") or {}
            if m.get("mor"):
                prune_conds = [
                    c for c in where
                    if c[0] in self.key_cols
                    or (c[0] == "_lsn" and c[1] in (">=", ">"))
                ]
            else:
                prune_conds = list(where)
            files = [
                f
                for f in files
                if _file_matches(fstats.get(f, {}), prune_conds)
            ]
        # gate on the MANIFEST's blooms, not this process's writer
        # config — a lookup-only process must still benefit from
        # sidecars an ingest process built
        fblooms = (m.get("file_blooms") or {}) if where else {}
        if fblooms:
            # a point probe (== on every key column) can additionally
            # consult the Bloom sidecars — the only prune that works on
            # hash-ordered delta files. Key-column-only, so it is exact
            # under MoR by the same argument as key-column zone maps.
            eq = {c: v for c, op, v in where if op == "==" and c in self.key_cols}
            if set(eq) == set(self.key_cols):
                hashes = _bloom_probe_hashes(self.key_cols, eq)
                files = [
                    f
                    for f in files
                    if _bloom_maybe_contains(self._abs(f), fblooms.get(f), hashes)
                ]
        self.last_prune = {"files_total": n_candidates, "files_read": len(files)}

        def _filtered(df: DataFrame) -> DataFrame:
            import operator as _op

            ops = {"==": _op.eq, ">=": _op.ge, ">": _op.gt,
                   "<=": _op.le, "<": _op.lt}
            for col, op, val in where or []:
                if op == "in":
                    df = df.filter(F.col(col).isin(list(val)))
                else:
                    df = df.filter(ops[op](F.col(col), F.lit(val)))
            return df

        if not files:
            from pyspark.sql import types as T

            schema = m["schema"]
            if schema is None:
                raise EmptyTableError("empty table has no schema yet")
            df = spark.createDataFrame([], T.StructType.fromJson(schema))
            df = self._resolve_mor(df) if m.get("mor") else df
            return _filtered(df)
        if m["schema"] is not None:
            # the manifest records the evolved (union) schema at commit
            # time — reading with it skips the per-batch distributed
            # footer-inference job that mergeSchema would run, and older
            # files simply surface nulls for later-added columns
            from pyspark.sql import types as T

            reader = spark.read.schema(T.StructType.fromJson(m["schema"]))
        else:
            reader = spark.read.option("mergeSchema", "true")
        df = reader.parquet(*[self._abs(f) for f in files]).drop(BUCKET_COL)
        df = self._resolve_mor(df) if m.get("mor") else df
        return _filtered(df)

    def lookup(self, spark: SparkSession, key: dict[str, Any]) -> DataFrame:
        """Point lookup by full key: bucket pruning (the key hashes to
        exactly one bucket) + zone-map file skipping + the equality
        filter — a 100 TB table answers this from one bucket's
        surviving files. ``key`` must bind every key column."""
        if sorted(key) != sorted(self.key_cols):
            raise ValueError(
                f"lookup key must bind exactly {self.key_cols}, got "
                f"{sorted(key)}"
            )
        m = self.manifest()
        if m["schema"] is None:
            raise EmptyTableError("empty table has no schema yet")
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(m["schema"])
        # bucket id via the engine's own hash expression on a one-row
        # local plan (constant-folded — no data scan), so Python never
        # re-implements Spark's xxhash64
        lits = [
            F.lit(key[c]).cast(schema[c].dataType) for c in self.key_cols
        ]
        bucket = (
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(*lits), F.lit(self.n_buckets))
                .cast("int")
                .alias("b")
            )
            .first()["b"]
        )
        where = [(c, "==", key[c]) for c in self.key_cols]
        return self.read(spark, buckets=[bucket], where=where)

    def lookup_many(
        self, spark: SparkSession, keys: list[dict[str, Any]]
    ) -> DataFrame:
        """Batched point lookups: ONE scan serving many keys.

        Buckets are computed for all keys in a single tiny local job
        (the engine's own hash expression — Python never re-implements
        xxhash64), candidate files are skipped unless ANY key could
        live in them (zone maps + Bloom sidecars, key columns only —
        exact under MoR), and the result is the scan semi-joined
        against the broadcast key set. At serving scale this replaces
        N single-key reads (N listings, N scans) with one bucket-pruned
        scan — the multi-get shape a feature-store/serving layer needs.
        """
        if not keys:
            raise ValueError("lookup_many needs at least one key")
        for key in keys:
            if sorted(key) != sorted(self.key_cols):
                raise ValueError(
                    f"every key must bind exactly {self.key_cols}, got "
                    f"{sorted(key)}"
                )
        m = self.manifest()
        if m["schema"] is None:
            raise EmptyTableError("empty table has no schema yet")
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(m["schema"])
        key_schema = T.StructType(
            [T.StructField(c, schema[c].dataType) for c in self.key_cols]
        )
        keys_df = spark.createDataFrame(
            [tuple(k[c] for c in self.key_cols) for k in keys], key_schema
        )
        rows = keys_df.select(
            *self.key_cols,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in self.key_cols]),
                F.lit(self.n_buckets),
            )
            .cast("int")
            .alias("__b"),
        ).collect()
        buckets = sorted({r["__b"] for r in rows})
        df = self.read(spark, buckets=buckets, _point_keys=keys)
        return df.join(
            F.broadcast(keys_df), on=list(self.key_cols), how="left_semi"
        )

    def stats(self) -> dict[str, Any]:
        """Operational summary (driver-side: manifest + file stat
        calls, no Spark job): layout, ledger, per-bucket file skew,
        metadata coverage — the numbers an operator checks before
        deciding to compact/rescale/vacuum. On an object store the
        per-file ``getsize`` calls would come from the listing the
        manifest replaces; total_bytes is therefore best-effort
        (missing files count 0, e.g. under concurrent vacuum)."""
        import glob as _glob

        m = self.manifest()
        per_bucket_files = {b: len(fs) for b, fs in m["buckets"].items()}
        total_bytes = 0
        total_files = 0
        for fs in m["buckets"].values():
            for f in fs:
                total_files += 1
                try:
                    total_bytes += os.path.getsize(self._abs(f))
                except OSError:
                    pass
        file_counts = sorted(per_bucket_files.values())
        n_versions = len(
            _glob.glob(os.path.join(self.root, "_manifest", "manifest-*.json"))
        )
        blooms = m.get("file_blooms") or {}
        return {
            "version": m["version"],
            "live_versions": n_versions,
            "n_buckets": self.n_buckets,
            "key_cols": list(self.key_cols),
            "mor": bool(m.get("mor")),
            "committed_batches": len(m["committed"]),
            "lineage_rows": len(m["lineage"]),
            "total_rows": (m.get("stats") or {}).get("total_rows"),
            "total_files": total_files,
            "total_bytes": total_bytes,
            "nonempty_buckets": len(file_counts),
            "max_files_per_bucket": max(file_counts, default=0),
            "median_files_per_bucket": (
                file_counts[len(file_counts) // 2] if file_counts else 0
            ),
            "zone_mapped_files": len(m.get("file_stats") or {}),
            "bloom_files": sum(1 for v in blooms.values() if v.get("m")),
            "tags": dict(m.get("tags") or {}),
            "changelog": bool(m.get("changelog")),
            "changelog_batches": len(
                _glob.glob(
                    os.path.join(
                        self.root, "_changes", "epoch=*", "batch_id=*"
                    )
                )
            ),
        }

    def delete_where(
        self,
        spark: SparkSession,
        predicate: str,
        *,
        epoch: str | None = None,
        batch_id: int | None = None,
    ) -> dict[str, Any]:
        """Row retention / right-to-erasure: delete every row matching
        a SQL predicate, as a first-class LEDGERED merge — not a bare
        rewrite. That buys, for free: exactly-once under crash/retry
        (``batch_id`` defaults to the current manifest version, which a
        crashed retry re-derives identically), merge-on-read support
        (delete markers outrank their victims by ``_lsn + 1`` per key —
        later real events at higher LSNs can still re-create the key),
        and — on ``changelog=True`` tables — an audit trail of the
        deleted rows' pre-images (who was erased, when, by which
        maintenance batch: the GDPR evidence requirement).

        Scale shape: one predicate-filtered read (zone maps prune files
        when the predicate covers stats columns) producing only
        (key, _lsn) rows; the merge then touches only the victims'
        buckets.

        The default epoch scopes the ledger key to THIS predicate
        (``__maintenance__<sha1(predicate)>``): a crashed retry still
        re-derives the identical (epoch, batch_id), while a concurrent
        delete_where with a DIFFERENT predicate that read the same
        version no longer collides into a silent ledger skip
        (multi-writer OCC made that interleaving reachable).
        """
        import hashlib

        if epoch is None:
            epoch = (
                "__maintenance__"
                + hashlib.sha1(predicate.encode("utf-8")).hexdigest()[:8]
            )
        m = self.manifest()
        if m["schema"] is None:
            return {"skipped": True, "reason": "empty table"}
        if batch_id is None:
            batch_id = m["version"]
        if [epoch, batch_id] in m["committed"]:
            return {"skipped": True, "reason": "already committed"}
        victims = self.read(spark).filter(F.expr(predicate))
        cols = [*self.key_cols]
        if "_lsn" in victims.columns:
            victims = victims.withColumn(
                "_lsn", F.col("_lsn") + F.lit(1)
            )
            cols.append("_lsn")
        upd = victims.select(*cols).withColumn(
            "__is_delete", F.lit(True)
        )
        r = self.merge(upd, epoch=epoch, batch_id=batch_id)
        r["predicate"] = predicate
        r["epoch"] = epoch  # predicate-scoped; changelog audits key on it
        return r

    def extra(self) -> dict[str, Any]:
        """Engine-level key/values recorded via ``merge(manifest_extra=)``
        (e.g. the bootstrap snapshot LSN); carried forward by every
        commit, including maintenance rewrites."""
        return dict(self.manifest().get("extra") or {})

    def lineage(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage rows (north_rule) as a DataFrame:
        (epoch, batch_id, bucket, n_updates, n_deletes, min_lsn,
        max_lsn) for every committed batch — the audit surface for
        'which batch wrote what, where'."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("epoch", T.StringType()),
                T.StructField("batch_id", T.LongType()),
                T.StructField("bucket", T.IntegerType()),
                T.StructField("n_updates", T.LongType()),
                T.StructField("n_deletes", T.LongType()),
                T.StructField("min_lsn", T.LongType()),
                T.StructField("max_lsn", T.LongType()),
            ]
        )
        rows = [
            tuple(r.get(f.name) for f in schema.fields)
            for r in self.manifest()["lineage"]
        ]
        return spark.createDataFrame(rows, schema)

    def read_changes(
        self, spark: SparkSession, *, since_version: int
    ) -> DataFrame:
        """Incremental read (changefeed) for merge-on-read tables: the
        delta rows committed AFTER ``since_version``, LWW-resolved
        within the window, with ``_deleted`` exposed as a change-type
        flag (True = the key was deleted in this window). The Iceberg
        incremental-read / Delta CDF analog.

        Only append-mode (MoR) commits produce row-level deltas — a COW
        rewrite replaces whole buckets, so per-row change capture is
        not reconstructable from it. Raises if the window contains no
        delta files but the table advanced (i.e. COW commits happened).
        """
        m = self.manifest()
        if since_version >= m["version"]:
            raise ValueError(
                f"since_version {since_version} is not before the current "
                f"version {m['version']}"
            )
        base = self.manifest(since_version)
        base_files = {
            os.path.realpath(self._abs(f))
            for fs in base["buckets"].values()
            for f in fs
        }
        new_files = [
            f
            for fs in m["buckets"].values()
            for f in fs
            if os.path.realpath(self._abs(f)) not in base_files
        ]
        if not new_files:
            from pyspark.sql import types as T

            return spark.createDataFrame([], T.StructType.fromJson(m["schema"]))
        delta_files = [f for f in new_files if "-delta" in os.path.basename(os.path.dirname(os.path.dirname(f)))]
        if len(delta_files) != len(new_files):
            raise ValueError(
                "read_changes requires every commit in the window to be "
                "merge-on-read (append strategy): COW/compaction rewrites "
                "replace whole buckets and are not row-level changes"
            )
        from pyspark.sql import types as T

        df = (
            spark.read.schema(T.StructType.fromJson(m["schema"]))
            .parquet(*[self._abs(f) for f in delta_files])
            .drop(BUCKET_COL)
        )
        # LWW within the window: THE SAME resolution as read() —
        # one implementation, so the changefeed's winner can never
        # disagree with the table's winner for the same key; deletes
        # stay as rows (a delete is a change the consumer must see)
        return self._resolve_mor(df, keep_deleted=True)

    def _write_changes(
        self,
        spark: SparkSession,
        m: dict[str, Any],
        upd: DataFrame,
        *,
        touched: list[int] | None,
        epoch: str,
        batch_id: int,
        delete_col: str,
    ) -> None:
        """Row-level change capture for this batch (``changelog=True``):
        classify the post-LWW update set against the PRE-batch table
        state and write ``_changes/epoch=<e>/batch_id=<b>/`` with a
        Delta-CDF-style ``_change_type`` column (insert /
        update_preimage / update_postimage / delete; a delete of an
        absent key emits nothing — no net change).

        Scale shape: one extra read of the target, pruned to the
        touched buckets and inner-joined against the BROADCAST batch
        key set (pre-image volume is bounded by the batch's key count,
        not the table size — the same argument as the broadcast merge).
        MoR tables resolve pre-images through the LWW aggregate first,
        so pre-images are true current rows, not raw delta versions.
        The write is overwrite-idempotent per (epoch, batch_id): a
        replayed batch rewrites the same directory. Crash safety:
        entries for batches that never reached the ledger are invisible
        to ``read_changelog`` (committed-only join) and are GC'd by
        ``vacuum``.
        """
        changes, pre = self._changes_for(
            spark, m, upd, touched=touched, delete_col=delete_col
        )
        chg_dir = os.path.join(
            self.root, "_changes", f"epoch={epoch}", f"batch_id={batch_id}"
        )
        changes.write.mode("overwrite").parquet(chg_dir)
        if pre is not None:
            pre.unpersist()

    def _changes_for(
        self,
        spark: SparkSession,
        m: dict[str, Any],
        upd: DataFrame,
        *,
        touched: list[int] | None,
        delete_col: str,
    ) -> tuple[DataFrame, DataFrame | None]:
        """Classified change set for one batch (see ``_write_changes``);
        returns (changes, persisted pre-image DF to unpersist after the
        action, or None). Split out so the plan audit can assert the
        join shape of the REAL capture path."""
        keyed = upd.drop(BUCKET_COL) if BUCKET_COL in upd.columns else upd
        # _change_lsn = the LSN of the change event that PRODUCED each
        # entry (post-images carry their own row's LSN; pre-images and
        # deletes carry the LSN of the update/delete that displaced
        # them, NOT the displaced row's). Second-hop consumers need it:
        # a delete re-applied downstream must outrank the row it
        # deletes under LWW, and the pre-image's own _lsn ties with it.
        chg_lsn = (
            F.col("_lsn") if "_lsn" in keyed.columns
            else F.lit(None).cast("long")
        )
        have_target = bool(m["buckets"]) and (
            touched is None or any(str(b) in m["buckets"] for b in touched)
        )
        if not have_target:
            return (
                keyed.filter(~F.col(delete_col))
                .drop(delete_col)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_change_lsn", chg_lsn),
                None,
            )
        tgt = self.read(spark, buckets=touched, _manifest=m)
        batch_keys = F.broadcast(
            keyed.select(
                *self.key_cols,
                F.col(delete_col).alias("__del"),
                chg_lsn.alias("__chg_lsn"),
            )
        )
        pre = tgt.join(batch_keys, on=self.key_cols, how="inner").persist()
        pre_rows = (
            pre.withColumn(
                "_change_type",
                F.when(F.col("__del"), F.lit("delete")).otherwise(
                    F.lit("update_preimage")
                ),
            )
            .withColumn("_change_lsn", F.col("__chg_lsn"))
            .drop("__del", "__chg_lsn")
        )
        existed = pre.select(*self.key_cols).withColumn(
            "__existed", F.lit(True)
        )
        posts = (
            keyed.filter(~F.col(delete_col))
            .drop(delete_col)
            .join(F.broadcast(existed), on=self.key_cols, how="left")
            .withColumn(
                "_change_type",
                F.when(
                    F.col("__existed"), F.lit("update_postimage")
                ).otherwise(F.lit("insert")),
            )
            .drop("__existed")
            .withColumn("_change_lsn", chg_lsn)
        )
        return pre_rows.unionByName(posts, allowMissingColumns=True), pre

    def _carry_forward(
        self,
        commit: dict[str, Any],
        m: dict[str, Any],
        manifest_extra: dict[str, Any] | None,
    ) -> None:
        """Table-level manifest fields every commit path must carry:
        one helper instead of N copy-pasted blocks, so a future field
        cannot be dropped by the one path that forgot it."""
        commit["changelog"] = bool(m.get("changelog") or self.changelog)
        if m.get("tags"):
            commit["tags"] = m["tags"]
        carried_extra = {**(m.get("extra") or {}), **(manifest_extra or {})}
        if carried_extra:
            commit["extra"] = carried_extra

    def has_changes(self, epoch: str, batch_id: int) -> bool:
        """True if this batch wrote a NON-EMPTY changelog entry.

        False for ledger-only empty-batch commits, never-run batches,
        and batches whose net change set was empty (e.g. only deletes
        of absent keys) — those may leave a directory containing no
        parquet files, which must not be treated as readable changes.
        """
        import glob as _glob

        d = os.path.join(
            self.root, "_changes", f"epoch={epoch}", f"batch_id={batch_id}"
        )
        return bool(_glob.glob(os.path.join(d, "*.parquet")))

    def _changelog_schema(self, m: dict[str, Any]):
        """Changelog row shape derived from the table schema (for empty
        results where nothing can be inferred from parquet files)."""
        from pyspark.sql import types as T

        base = (
            T.StructType.fromJson(m["schema"])
            if m["schema"] is not None
            else T.StructType(
                [T.StructField(c, T.StringType()) for c in self.key_cols]
            )
        )
        return T.StructType(
            [f for f in base.fields if f.name not in ("_deleted", "__seq")]
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_change_lsn", T.LongType()),
                T.StructField("epoch", T.StringType()),
                T.StructField("batch_id", T.IntegerType()),
            ]
        )

    def read_changelog(
        self, spark: SparkSession, *, epoch: str | None = None
    ) -> DataFrame:
        """COMMITTED row-level changes with pre/post images (Delta CDF
        analog; requires the table to run with ``changelog=True``).

        Partition columns ``epoch``/``batch_id`` come back on every row
        (and prune the scan when filtered on). Changelog directories
        whose batch never reached the ledger — crash leftovers, aborted
        error-contract batches, unpublished WAP stages — are filtered
        out against the committed ledger, so consumers only ever see
        changes of applied batches.
        """
        import glob as _glob

        chg_root = os.path.join(self.root, "_changes")
        m = self.manifest()
        if not os.path.isdir(chg_root):
            raise ValueError(
                "table has no changelog — create the table with "
                "changelog=True to capture row-level changes"
            )
        if not _glob.glob(
            os.path.join(chg_root, "epoch=*", "batch_id=*", "*.parquet")
        ):
            # every entry expired (vacuum changelog retention) or none
            # written yet: an empty result, not a schema-inference crash
            return spark.createDataFrame([], self._changelog_schema(m))
        # explicit manifest-derived schema: skips the distributed
        # footer-merge job AND keeps mixed-width changelogs readable
        # after a type widening (mergeSchema refuses int-vs-long file
        # pairs; explicit-schema reads promote the narrow files)
        df = (
            spark.read.option("basePath", chg_root)
            .schema(self._changelog_schema(m))
            .parquet(chg_root)
        )
        committed = [(e, b) for e, b in m["committed"]]
        if not committed:
            df = df.filter(F.lit(False))
        elif len(committed) <= 1000:
            # small ledger: a literal isin keeps the filter inside the
            # scan (partition pruning on epoch/batch_id)
            keys = {f"{e}#{b}" for e, b in committed}
            df = df.filter(
                F.concat_ws(
                    "#", F.col("epoch"), F.col("batch_id").cast("string")
                ).isin(*keys)
            )
        else:
            # long ledger: a million-literal In expression would bloat
            # the plan — broadcast semi-join against the ledger instead
            ledger_df = spark.createDataFrame(
                committed, "epoch string, batch_id long"
            )
            df = df.join(
                F.broadcast(ledger_df), on=["epoch", "batch_id"],
                how="left_semi",
            )
        if epoch is not None:
            df = df.filter(F.col("epoch") == epoch)
        return df

    def _resolve_mor(
        self, df: DataFrame, *, keep_deleted: bool = False
    ) -> DataFrame:
        """Merge-on-read resolution: per key keep the max-``(_lsn,
        __seq)`` row (delta rows beat the base rows they supersede),
        then drop rows whose winner is a ``_deleted`` marker. A no-op
        pass-through for tables that never saw an append-mode merge.

        ``__seq`` is the commit version stamped into every delta file
        (``_merge_append``); base files and pre-stamp deltas read it as
        null and rank lowest. It breaks ``_lsn`` TIES by commit order,
        which otherwise resolve nondeterministically: a delete marker
        whose ``_lsn`` was coalesced from the pre-image it deletes
        (second-hop CDC of a derived view, incremental.py
        apply_changes_to_table), or a view row rewritten by a DIM-side
        change that leaves the fact's ``_lsn`` unchanged — in both the
        later commit is the truth. Staged (WAP) commits stamp the
        version predicted at stage time; under the single-driver model
        stages of one table are serialized, so stage order = publish
        order."""
        if "_lsn" not in df.columns:
            return df
        others = [c for c in df.columns if c not in self.key_cols]
        packed = F.struct(*[F.col(c) for c in others])
        seq = (F.coalesce(F.col("__seq"), F.lit(-1))
               if "__seq" in df.columns else F.lit(-1))
        resolved = (
            df.groupBy(*[F.col(c) for c in self.key_cols])
            .agg(F.max_by(packed, F.struct(F.col("_lsn"), seq)).alias("__r"))
            .select(*self.key_cols, "__r.*")
        )
        if "_deleted" in others:
            if keep_deleted:
                # changefeed consumers must SEE deletes as rows
                resolved = resolved.withColumn(
                    "_deleted", F.coalesce(F.col("_deleted"), F.lit(False))
                )
            else:
                resolved = resolved.filter(
                    ~F.coalesce(F.col("_deleted"), F.lit(False))
                ).drop("_deleted")
        if "__seq" in others:
            resolved = resolved.drop("__seq")
        return resolved

    def _merge_append(
        self, m, upd, *, touched, n_upd, obs, touched_rows,
        epoch, batch_id, delete_col, lineage, pre_commit,
        publish: bool = True, manifest_extra: dict[str, Any] | None = None,
        _cache=None, widen_map: dict[str, str] | None = None,
    ) -> dict[str, Any]:
        """Merge-on-read commit: append this batch's update rows
        (deletes as ``_deleted`` markers) without reading the target at
        all — write cost is O(batch), independent of table size. Reads
        resolve LWW by ``_lsn`` (see ``_resolve_mor``); ``compact()``
        folds deltas into the base."""
        if "_lsn" not in upd.columns:
            raise ValueError(
                "append (merge-on-read) strategy requires an _lsn column "
                "on the update set (Replayer.updates_for provides it)"
            )
        version = m["version"] + 1
        # __seq = this delta's commit version: the constant-per-file
        # tiebreaker _resolve_mor uses for equal-_lsn versions (RLE
        # makes it free in the file)
        delta = (
            upd.withColumn("_deleted", F.col(delete_col))
            .drop(delete_col)
            .withColumn("__seq", F.lit(version).cast("long"))
        )
        # per-attempt unique dir — same OCC no-clobber rule as the COW
        # path (see merge())
        rel_dir = os.path.join(
            "data", f"v{version:08d}-b{batch_id}-w{uuid.uuid4().hex[:8]}-delta"
        )
        if not publish:
            # same staged-dir uniqueness rule as the COW path: an
            # unpublished delta must never share a dir with another stage
            rel_dir += f"-stage{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.root, rel_dir)
        n_parts = len(touched) if touched is not None else self.n_buckets
        (
            delta.repartition(max(1, n_parts), F.col(BUCKET_COL))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", self.target_rows_per_file)
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        if self.changelog:
            # pre-images resolve through the MoR LWW read of the
            # PRE-append manifest — true current rows, not delta
            # versions (this is the read the append strategy otherwise
            # avoids; change capture is what you are paying for)
            self._write_changes(
                upd.sparkSession, m, upd, touched=touched,
                epoch=epoch, batch_id=batch_id, delete_col=delete_col,
            )
        if self.discovery:
            upd.unpersist()
        elif _cache is not None:
            # the dense-mode observe() wrapper does not sameResult the
            # cached child plan — release the exact persisted handle
            _cache.unpersist()
        n_upd, dense_lsn_range = _harvest_dense_obs(obs, n_upd)

        appended = {
            str(b): fs for b, fs in _list_written(out_dir, rel_dir).items()
        }

        delta_schema = json.loads(delta.drop(BUCKET_COL).schema.json())
        wm = widen_map or {}

        def _schema_for(mbase):
            # additive schema union: existing fields keep their order
            # (but widen to the _widen_updates-resolved type — reads
            # apply the manifest schema, and Spark 4's Parquet readers
            # promote the old narrower files), new delta columns (incl.
            # _deleted) append
            if mbase["schema"] is None:
                return delta_schema
            seen = {f["name"] for f in mbase["schema"]["fields"]}
            fields = [
                {**f, "type": wm[f["name"]]} if f["name"] in wm else f
                for f in mbase["schema"]["fields"]
            ] + [
                f for f in delta_schema["fields"] if f["name"] not in seen
            ]
            return {**mbase["schema"], "fields": fields}

        if touched_rows is not None:
            lineage_rows = [
                {
                    "epoch": epoch, "batch_id": batch_id,
                    "bucket": int(r[BUCKET_COL]),
                    "n_updates": int(r["n_updates"]),
                    "n_deletes": int(r["n_deletes"] or 0),
                    "min_lsn": r["min_lsn"], "max_lsn": r["max_lsn"],
                }
                for r in touched_rows
            ]
        else:
            lineage_rows = [
                {"epoch": epoch, "batch_id": batch_id, "bucket": None,
                 "n_updates": n_upd, **dense_lsn_range}
            ]
        def build(mbase):
            nb = dict(mbase["buckets"])
            for b, files in appended.items():
                nb[b] = nb.get(b, []) + files
            prev_rows = (mbase.get("stats") or {}).get("total_rows", 0)
            commit = {
                "version": mbase["version"] + 1,
                "buckets": nb,
                "committed": mbase["committed"] + [[epoch, batch_id]],
                "lineage": mbase["lineage"] + (lineage or []) + lineage_rows,
                "schema": _schema_for(mbase),
                "stats": {"total_rows": prev_rows + (n_upd or 0)},
                "mor": True,
                "n_buckets": self.n_buckets,
                "key_cols": self.key_cols,
            }
            self._carry_forward(commit, mbase, manifest_extra)
            return commit

        if pre_commit is not None:
            pre_commit(n_upd)
        staged = None
        if publish:
            # OCC: a pure append read NOTHING from the target, so it
            # rebases over any same-layout interleaving — UNLESS change
            # capture ran (pre-images were resolved against the base
            # state of the touched buckets) in which case those buckets
            # must be unchanged on the head. Equal-(key, lsn) rows from
            # two DIFFERENT writers tie-break arbitrarily by __seq, the
            # same contract as redelivered duplicates — a CDC source
            # that assigns one LSN to two different payloads is broken
            # upstream of the sink.
            final = self._publish_commit(
                build, m,
                lambda b, h: self._rebase_guard(
                    b, h, touched if self.changelog else []
                ),
                epoch=epoch, batch_id=batch_id,
            )
            if final is None:
                return {"skipped": True, "reason": "already committed"}
            out_version = final["version"]
        else:
            commit = build(m)
            staged = self._stage(commit, self._stage_occ(
                m, mode="append",
                read_buckets=touched if self.changelog else [],
                appended=appended, manifest_extra=manifest_extra,
            ))
            out_version = commit["version"]
        return {
            "skipped": False,
            "version": out_version,
            "staged": staged,
            "touched_buckets": touched if touched is not None else "all",
            "n_updates": n_upd,
            "mode": "append",
        }

    # --------------------------------------------------------- maintenance

    def compact(
        self,
        spark: SparkSession,
        *,
        max_files_per_bucket: int = 8,
        all_buckets: bool = False,
        sort: bool = True,
        sort_cols: list[str] | None = None,
        layout: str = "linear",
        zorder_bits: int = 6,
    ) -> dict[str, Any]:
        """Rewrite buckets whose live file count exceeds the threshold
        into ``target_rows_per_file``-sized files.

        Pure maintenance: row contents, committed-batch ledger and
        lineage are untouched; the rewrite commits via the same atomic
        manifest swap (a crash leaves only orphaned new files). The
        broadcast merge path appends O(n_buckets) small upsert files per
        batch by design — compaction is the amortized counterweight,
        exactly like Iceberg's rewrite_data_files action.

        ``sort=True`` (default) clusters each bucket by ``key_cols``
        while rewriting (Iceberg rewrite_data_files sort-strategy
        analog): ``sortWithinPartitions`` is a per-task sort with NO
        extra shuffle on top of the bucket repartition, and the parquet
        writer splits the sorted run sequentially under
        ``maxRecordsPerFile``, so the rewritten files of a bucket carry
        pairwise-disjoint key ranges. That turns the manifest zone maps
        from "skip cold buckets" into "skip every file but one": a
        point lookup on a 100 TB table reads one bucket AND one file.
        Merge batches deliberately skip this sort (the broadcast path
        is exchange-free by design) — layout is maintenance's job.

        ``layout="zorder"`` replaces the lexicographic in-bucket sort
        with a Morton-interleaved key over ``sort_cols`` (see
        ``_zorder_key``): use it when reads filter on SEVERAL
        independent columns — a linear sort tightens zone maps only on
        the leading column, z-order tightens all of them at the cost of
        each being coarser. Two or more ``sort_cols`` required (with
        one, linear is strictly better).

        ``all_buckets=True`` rewrites every live bucket regardless of
        file count. On a merge-on-read table this fully folds all delta
        files, so the commit also CLEARS the ``mor`` flag — subsequent
        reads skip the per-key LWW resolution aggregate entirely
        (the table graduates back to plain scan reads). A partial
        (threshold) compaction never clears the flag: a bucket with one
        un-compacted delta file can still hold several versions of a
        key.
        """
        if layout not in ("linear", "zorder"):
            raise ValueError("layout must be 'linear' or 'zorder'")
        if layout == "zorder" and (not sort or len(sort_cols or []) < 2):
            raise ValueError(
                "layout='zorder' requires sort=True and >= 2 sort_cols "
                "(with one column a linear sort prunes strictly better)"
            )
        m = self.manifest()
        if all_buckets:
            over = sorted(int(b) for b, fs in m["buckets"].items() if fs)
        else:
            over = sorted(
                int(b)
                for b, fs in m["buckets"].items()
                if len(fs) > max_files_per_bucket
            )
        if not over:
            return {"compacted_buckets": [], "version": m["version"]}

        # read exactly the manifest the plan was built from (not a
        # re-resolved head): the OCC rebase guard then compares the
        # true read set, and a commit landing mid-compaction can never
        # make the rewrite internally inconsistent
        df = self.read(spark, buckets=over, _manifest=m).withColumn(
            BUCKET_COL, _bucket_expr(self.key_cols, self.n_buckets)
        )
        version = m["version"] + 1
        rel_dir = os.path.join(
            "data", f"v{version:08d}-compact-w{uuid.uuid4().hex[:8]}"
        )
        out_dir = os.path.join(self.root, rel_dir)
        writer_df = df.repartition(len(over), F.col(BUCKET_COL))
        if sort:
            # sort_cols overrides the key clustering: cluster by the
            # columns your PREDICATES hit (e.g. a timestamp, a lang
            # column targeted by delete_where/read(where=...)) and the
            # zone maps prune files on those predicates instead of key
            # lookups — same idea as Iceberg's sort-order evolution.
            # Still sortWithinPartitions: no exchange beyond the bucket
            # repartition either way.
            cluster = sort_cols if sort_cols else list(self.key_cols)
            if layout == "zorder":
                writer_df = writer_df.sortWithinPartitions(
                    F.col(BUCKET_COL),
                    _zorder_key(
                        df, cluster, bits=zorder_bits,
                        total_rows=(m.get("stats") or {}).get("total_rows"),
                    ),
                )
            else:
                writer_df = writer_df.sortWithinPartitions(
                    F.col(BUCKET_COL), *[F.col(c) for c in cluster]
                )
        (
            writer_df
            .write.mode("overwrite")
            .option("maxRecordsPerFile", self.target_rows_per_file)
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        written = _list_written(out_dir, rel_dir)
        new_buckets = dict(m["buckets"])
        for b in over:
            if b in written:
                new_buckets[str(b)] = written[b]
            else:
                # the resolving read produced ZERO rows for this bucket
                # (e.g. every key deleted): the old files must leave the
                # manifest, or their unresolved base+marker rows would
                # resurface — fatally so once all_buckets clears mor
                new_buckets.pop(str(b), None)
        def build(mbase):
            nb = dict(mbase["buckets"])
            for b in over:
                if b in written:
                    nb[str(b)] = written[b]
                else:
                    nb.pop(str(b), None)
            commit = dict(mbase)
            commit["version"] = mbase["version"] + 1
            commit["buckets"] = nb
            # "every delta folded" is a property of the BASE this commit
            # finally lands on, not of the plan-time base: a rebase may
            # sit on top of a commit that appended delta files to a
            # bucket that was EMPTY at plan time (so outside ``over``
            # and invisible to the read-set guard) — clearing mor then
            # would surface its _deleted markers as rows. Clear only
            # when the landed base holds no live files outside the
            # folded set.
            fully_folded = all_buckets and not any(
                fs for b, fs in mbase["buckets"].items() if int(b) not in set(over)
            )
            if fully_folded and mbase.get("mor"):
                # every delta has been folded through _resolve_mor:
                # reads no longer need the LWW aggregate. _deleted
                # marker rows and the __seq commit-order tiebreaker
                # were dropped by the resolving read, so the columns
                # can leave the schema too (additive-contract
                # exception: engine metadata, not user data).
                commit["mor"] = False
                if mbase["schema"] is not None:
                    commit["schema"] = {
                        **mbase["schema"],
                        "fields": [
                            f for f in mbase["schema"]["fields"]
                            if f["name"] not in ("_deleted", "__seq")
                        ],
                    }
            return commit

        # OCC: compaction READ exactly the buckets it rewrote, so it
        # rebases over concurrent commits that stayed out of them; a
        # conflicting commit inside them abandons this compaction
        # (files become vacuum orphans — the caller retries later
        # against fresher state, which it would want anyway)
        final = self._publish_commit(
            build, m,
            lambda b, h: self._rebase_guard(b, h, over),
            epoch="__compact__", batch_id=-1,  # never appears in ledgers
            # ledger-invariant commit: the op identity (not the tail)
            # is what makes a racing maintenance claim adoptable
            op=["compact", sorted(over), bool(all_buckets)],
        )
        assert final is not None  # maintenance is never ledger-skipped
        return {"compacted_buckets": over, "version": final["version"]}

    def rescale(self, spark: SparkSession, n_buckets: int) -> dict[str, Any]:
        """Rewrite the whole table under a new bucket count (partition
        evolution for the bucket transform). One full read+write;
        contents, ledger and lineage unchanged; commits via the same
        atomic swap. A MoR table is fully resolved by the rewrite, so
        the mor flag clears (same rule as compact(all_buckets=True)).
        The rewrite clusters each new bucket by ``key_cols`` (same
        zone-map-disjoint layout as ``compact(sort=True)``)."""
        m = self.manifest()
        if n_buckets == self.n_buckets:
            return {"version": m["version"], "n_buckets": n_buckets}
        df = self.read(spark, _manifest=m).withColumn(
            BUCKET_COL, _bucket_expr(self.key_cols, n_buckets)
        )
        version = m["version"] + 1
        rel_dir = os.path.join(
            "data", f"v{version:08d}-rescale-w{uuid.uuid4().hex[:8]}"
        )
        out_dir = os.path.join(self.root, rel_dir)
        (
            df.repartition(n_buckets, F.col(BUCKET_COL))
            .sortWithinPartitions(
                F.col(BUCKET_COL), *[F.col(c) for c in self.key_cols]
            )
            .write.mode("overwrite")
            .option("maxRecordsPerFile", self.target_rows_per_file)
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        new_buckets = {
            str(b): fs for b, fs in _list_written(out_dir, rel_dir).items()
        }
        def build(mbase):
            commit = dict(mbase)
            commit["version"] = mbase["version"] + 1
            commit["buckets"] = new_buckets
            commit["n_buckets"] = n_buckets
            commit["key_cols"] = self.key_cols
            if mbase.get("mor"):
                commit["mor"] = False
                if mbase["schema"] is not None:
                    commit["schema"] = {
                        **mbase["schema"],
                        "fields": [
                            f for f in mbase["schema"]["fields"]
                            if f["name"] not in ("_deleted", "__seq")
                        ],
                    }
            return commit

        # OCC: the rewrite read EVERY bucket, so only a commit that
        # changed nothing (ledger-only) can land in between — any data
        # commit aborts the rescale (files orphaned, caller retries)
        final = self._publish_commit(
            build, m,
            lambda b, h: self._rebase_guard(b, h, None),
            epoch="__rescale__", batch_id=-1,
            # two rescales to DIFFERENT bucket counts must never adopt
            # each other: the loser would set self.n_buckets to a count
            # the committed manifest does not have, and every later
            # merge would hash rows into the wrong buckets
            op=["rescale", n_buckets],
        )
        assert final is not None
        self.n_buckets = n_buckets
        return {"version": final["version"], "n_buckets": n_buckets}

    def vacuum(
        self, *, keep_versions: int = 2,
        changelog_keep_batches: int | None = None,
        drop_staged: bool = False,
        pin_versions: list[int] | None = None,
        dry_run: bool = False,
        orphan_grace_seconds: float = 3600.0,
    ) -> dict[str, Any]:
        """Garbage-collect data files no recent manifest references and
        manifest versions beyond the retention window — the engine's
        expire_snapshots/remove_orphan_files analog.

        A crashed merge leaves whole orphaned version directories (its
        manifest swap never happened), and every COW rewrite strands
        the replaced files; both accumulate until vacuumed. Retention:
        files referenced by any of the last ``keep_versions`` manifests
        survive (bounded time travel), everything else under ``data/``
        is deleted.

        ``orphan_grace_seconds`` defaults to ONE HOUR: an in-flight
        OCC writer's freshly-written files are unreferenced until its
        claim lands, so a default-flag vacuum beside live writers must
        not eat them (the classic remove_orphan_files race — the
        reference ecosystem refuses unsafely short retention by
        default for the same reason). Pass ``0`` explicitly for the
        strict quiesced-table mode (no merge in flight anywhere).

        Staged (write-audit-publish) commits are IN-FLIGHT, not garbage:
        their files are pinned by default — a staged token a transaction
        coordinator already decided to commit (txn.py) must stay
        publishable across a vacuum. ``drop_staged=True`` abandons them
        (manifest + files): only safe once every decided transaction has
        been rolled forward — use ``TransactionalRouter.vacuum`` which
        runs ``recover()`` first.
        """
        import glob

        current = self.manifest()
        versions = sorted(
            int(os.path.basename(p).split("-")[1].split(".")[0])
            for p in glob.glob(os.path.join(self.root, "_manifest", "manifest-*.json"))
        )
        # tagged versions are pinned: their manifests and data files
        # survive any retention window until the tag is dropped.
        # pin_versions pins externally-referenced snapshots the same way
        # (e.g. a TransactionalRouter's _txn/LAST version map, which
        # read_consistent time-travels to)
        tagged = set((current.get("tags") or {}).values()) | set(
            pin_versions or []
        )
        keep = [
            v for v in versions
            if v > current["version"] - keep_versions or v in tagged
        ]
        live: set[str] = set()
        for v in keep:
            with open(self._manifest_path(v)) as f:
                mv = json.load(f)
            for fs in mv["buckets"].values():
                live.update(os.path.realpath(self._abs(p)) for p in fs)
        staged_manifests = glob.glob(
            os.path.join(self.root, "_manifest", "staged-*.json")
        )
        staged_committed: set[tuple] = set()
        if not drop_staged:
            # pin every staged commit's files AND its changelog batches:
            # staged = in-flight WAP / a transaction participant awaiting
            # roll-forward. Its (epoch, batch_id) lives only in the
            # STAGED manifest's ledger until publish, so without this
            # pin the batch's _changes dir would be classified orphan —
            # and after publish the batch would silently read as
            # change-free, diverging every maintained aggregate.
            for p in staged_manifests:
                with open(p) as f:
                    sm = json.load(f)
                for fs in sm["buckets"].values():
                    live.update(os.path.realpath(self._abs(q)) for q in fs)
                staged_committed.update(
                    (e, b) for e, b in sm.get("committed", [])
                )
        # a Bloom sidecar lives exactly as long as its data file
        live |= {p + ".bloom" for p in live}
        # orphan_grace_seconds: under multi-writer OCC an in-flight
        # merge's freshly written files are unreferenced until its
        # claim lands — the classic remove_orphan_files race. A
        # nonzero grace keeps any file younger than the window (an
        # Iceberg-style age guard); 0 preserves the strict
        # quiesced-table contract ("run only while no merge is in
        # flight"), which remains the right mode for single writers.
        now = time.time()

        def _grace_protected(p: str) -> bool:
            if orphan_grace_seconds <= 0:
                return False
            try:
                return (now - os.path.getmtime(p)) < orphan_grace_seconds
            except OSError:
                return True  # vanished/being-written: leave it alone

        orphans = [
            p
            for p in glob.glob(os.path.join(self.root, "data", "**", "*"), recursive=True)
            if os.path.isfile(p)
            and os.path.realpath(p) not in live
            and not _grace_protected(p)
        ]
        expired = [v for v in versions if v not in keep]
        # a crashed _swap/publish leaves .tmp-<uuid> files next to
        # CURRENT / the manifests (written, never os.replace'd) —
        # harmless but immortal without this. Under the grace window a
        # YOUNG tmp file may belong to a live claimer mid-_swap
        # (between its json write and the os.link) — deleting it would
        # crash the writer with FileNotFoundError, so the same age
        # guard applies.
        stale_tmp = [
            p
            for p in glob.glob(
                os.path.join(self.root, "_manifest", "*.tmp-*")
            )
            if not _grace_protected(p)
        ]
        # changelog dirs whose batch never reached the ledger (crashed
        # or aborted merges): invisible to read_changelog, reclaimed
        # here. Committed changelog entries are retained indefinitely —
        # they are the downstream consumers' replay source.
        committed = {(e, b) for e, b in current["committed"]} | staged_committed
        # retention for COMMITTED changelog entries: keep the most
        # recent ``changelog_keep_batches`` batch ids per epoch (None =
        # keep all). Downstream consumers that may still need to fold a
        # batch (crash-recovery of maintained aggregates) bound their
        # lag by this window — same contract as Delta CDF retention.
        expired_chg: set[str] = set()
        if changelog_keep_batches is not None:
            per_epoch: dict[str, list[int]] = {}
            for e, b in current["committed"]:
                per_epoch.setdefault(e, []).append(b)
            for e, bs in per_epoch.items():
                drop = (
                    sorted(bs)[:-changelog_keep_batches]
                    if changelog_keep_batches > 0
                    else sorted(bs)
                )
                for b in drop:
                    expired_chg.add(
                        os.path.join(
                            self.root, "_changes", f"epoch={e}",
                            f"batch_id={b}",
                        )
                    )
        orphan_chg = []
        for d in glob.glob(
            os.path.join(self.root, "_changes", "epoch=*", "batch_id=*")
        ):
            e = os.path.basename(os.path.dirname(d)).split("=", 1)[1]
            b = int(os.path.basename(d).split("=", 1)[1])
            if d in expired_chg:
                orphan_chg.append(d)
            elif (e, b) not in committed:
                # an in-flight merge writes its changelog BEFORE its
                # manifest claim lands, so an uncommitted dir may
                # belong to a live writer — the grace window protects
                # it just like the writer's data files (retention of
                # COMMITTED entries above is never grace-gated). The
                # newest mtime within the dir is the age (the dir's
                # own mtime predates its last file).
                members = glob.glob(os.path.join(d, "**"), recursive=True)
                if not any(_grace_protected(p) for p in members + [d]):
                    orphan_chg.append(d)
        if not dry_run:
            import shutil
            from contextlib import suppress

            # every delete tolerates a concurrently-vanished target:
            # two overlapping vacuums (cron overlap, manual beside
            # scheduled) compute the same candidate lists, and the
            # second's cleanup must finish its report, not abort
            # partway on the first's deletions
            for d in orphan_chg:
                shutil.rmtree(d, ignore_errors=True)
            for p in stale_tmp:
                with suppress(FileNotFoundError):
                    os.remove(p)
            for p in orphans:
                with suppress(FileNotFoundError):
                    os.remove(p)
            # drop now-empty version/bucket directories
            for d in sorted(
                glob.glob(os.path.join(self.root, "data", "**"), recursive=True),
                key=len, reverse=True,
            ):
                with suppress(OSError):  # non-empty (race) or gone
                    if os.path.isdir(d) and not os.listdir(d):
                        os.rmdir(d)
            for v in expired:
                with suppress(FileNotFoundError):
                    os.remove(self._manifest_path(v))
            if drop_staged:
                for p in staged_manifests:
                    with suppress(FileNotFoundError):
                        os.remove(p)
                    sidecar = os.path.join(
                        os.path.dirname(p), "occ-" + os.path.basename(p)
                    )
                    with suppress(FileNotFoundError):
                        os.remove(sidecar)
            # sidecars whose staged manifest is gone (published or
            # dropped) are spent either way
            for p in glob.glob(
                os.path.join(self.root, "_manifest", "occ-staged-*.json")
            ):
                if not os.path.exists(
                    os.path.join(
                        os.path.dirname(p), os.path.basename(p)[4:]
                    )
                ):
                    with suppress(FileNotFoundError):
                        os.remove(p)
        return {
            "deleted_files": len(orphans),
            "expired_manifests": len(expired),
            "stale_tmp_files": len(stale_tmp),
            "orphan_changelog_dirs": len(orphan_chg),
            "kept_versions": keep,
            "staged_manifests": len(staged_manifests),
            "staged_dropped": drop_staged and not dry_run,
            "dry_run": dry_run,
        }

    # -------------------------------------------------------------- merge

    def payload_fields(self) -> list[dict[str, Any]]:
        """Manifest schema fields that are USER PAYLOAD: key columns
        and storage internals (``_lsn``, ``__is_delete``, and the MoR
        markers ``_deleted``/``__seq`` an append-strategy manifest
        records but ``read()`` resolves away) excluded. The one place
        derived views ask "which columns does this table contribute" —
        empty list while the table has no schema."""
        m = self.manifest()
        if m["schema"] is None:
            return []
        drop = set(self.key_cols) | {
            "_lsn", "__is_delete", "_deleted", "__seq"
        }
        return [f for f in m["schema"]["fields"] if f["name"] not in drop]

    def _widen_updates(
        self, m: dict[str, Any], updates: DataFrame, delete_col: str
    ) -> tuple[DataFrame, dict[str, str]]:
        """Resolve numeric type drift between an update frame and the
        manifest schema (merge() docstring note). Returns the frame
        with NARROWER-than-manifest columns cast up (so written files
        and — critically — the type-sensitive bucket hash always use
        the manifest type) plus ``widen_map`` ({col: wider json type})
        for columns where the MANIFEST must widen; COW picks the wider
        type up from Spark's union coercion, the append strategy
        applies widen_map in its manifest schema union. Raises on
        lossy/incompatible drift, on key-column widening (old rows were
        bucketed under the narrow type's hash — widening a key needs an
        explicit table rebuild/rescale), and in strict schema mode.

        Void-typed columns (untyped literal NULLs, e.g. a view fold's
        ``F.lit(None)``): if the manifest types the column, the update
        casts to that type (lossless); if the manifest does NOT know
        the column, it is DROPPED before the write — parquet cannot
        store void (Spark would silently write BOOLEAN and poison later
        widened reads), and an all-NULL column of unknown type carries
        no information: when a typed batch eventually arrives, the
        column evolves additively and earlier rows correctly read as
        NULL."""
        known = (
            {f["name"] for f in m["schema"]["fields"]}
            if m["schema"] is not None
            else set()
        )
        unknown_void = [
            f.name
            for f in updates.schema.fields
            if f.dataType.typeName() == "void" and f.name not in known
        ]
        if unknown_void:
            updates = updates.drop(*unknown_void)
        if m["schema"] is None:
            return updates, {}
        from transforms_for_apache_kafka_connect_spark.errors import (
            SchemaEnforcementError,
        )

        old = {f["name"]: f["type"] for f in m["schema"]["fields"]}
        casts: dict[str, str] = {}
        ddl_casts: dict[str, str] = {}
        widen_map: dict[str, str] = {}
        for f in json.loads(updates.schema.json())["fields"]:
            name, new_t = f["name"], f["type"]
            old_t = old.get(name)
            if name == delete_col or old_t is None or old_t == new_t:
                continue
            if new_t == "void":
                # an untyped all-NULL update column (e.g. a literal
                # None a view fold synthesized): cast to the manifest
                # type verbatim — lossless for ANY type incl. complex
                from pyspark.sql import types as T

                ddl_casts[name] = T.StructField.fromJson(
                    {"name": name, "type": old_t, "nullable": True,
                     "metadata": {}}
                ).dataType.simpleString()
                continue
            if not isinstance(old_t, str) or not isinstance(new_t, str):
                raise SchemaEnforcementError(
                    f"incompatible type evolution on column {name!r}: "
                    f"non-primitive type drift ({old_t!r} vs {new_t!r})"
                )
            wide = _wider_json_type(name, old_t, new_t)
            if wide == old_t:
                casts[name] = wide
            else:
                if name in self.key_cols:
                    raise SchemaEnforcementError(
                        f"cannot widen key column {name!r} from {old_t!r}"
                        f" to {new_t!r}: the bucket hash is "
                        f"type-sensitive, existing rows were placed "
                        f"under the {old_t!r} hash — rebuild the table "
                        f"(or cast the source back) instead"
                    )
                if self.schema_mode == "strict":
                    raise SchemaEnforcementError(
                        f"schema_mode='strict': update column {name!r} "
                        f"would widen the table type {old_t!r} -> "
                        f"{wide!r} — evolve explicitly "
                        f"(schema_mode='evolve') or cast the source"
                    )
                widen_map[name] = wide
        if casts or ddl_casts:
            updates = updates.withColumns(
                {
                    **{n: F.col(n).cast(_JSON_TO_DDL[t])
                       for n, t in casts.items()},
                    **{n: F.col(n).cast(t) for n, t in ddl_casts.items()},
                }
            )
        return updates, widen_map

    def _union_schema_from(
        self,
        commit: dict[str, Any],
        m: dict[str, Any],
        upd: DataFrame,
        delete_col: str,
    ) -> None:
        """Additive schema union from an update frame's STATIC schema
        into a ledger-only commit: an empty batch still declares its
        columns, exactly as a 1-row batch would evolve them — derived
        views rely on this when a fold's update frame is runtime-empty
        but carries newly-appeared dim payload columns. No-op while the
        table has no schema (nothing to read yet)."""
        if m["schema"] is None:
            return
        drop = [c for c in (BUCKET_COL, delete_col) if c in upd.columns]
        upd_schema = json.loads(upd.drop(*drop).schema.json())
        seen = {f["name"] for f in m["schema"]["fields"]}
        add = [dict(f, nullable=True) for f in upd_schema["fields"]
               if f["name"] not in seen]
        if add:
            commit["schema"] = {
                **m["schema"], "fields": m["schema"]["fields"] + add
            }

    def _commit_ledger_only(
        self, m, upd, delete_col, *, epoch, batch_id,
        manifest_extra, pre_commit, publish,
    ) -> dict[str, Any]:
        """Ledger-entry-only commit for a verifiably empty batch (the
        shared tail of merge()'s two empty branches), OCC-rebased like
        any data commit — no files were written, so the rebase guard
        only needs the physical layout to be unchanged (the schema
        union is recomputed against whatever base it lands on)."""
        def build(mbase):
            commit = dict(mbase)
            self._union_schema_from(commit, mbase, upd, delete_col)
            commit["version"] = mbase["version"] + 1
            commit["committed"] = mbase["committed"] + [[epoch, batch_id]]
            commit["n_buckets"] = self.n_buckets
            commit["key_cols"] = self.key_cols
            self._carry_forward(commit, mbase, manifest_extra)
            return commit

        if pre_commit is not None:
            pre_commit(0)  # verifiably empty batch
        staged = None
        if publish:
            final = self._publish_commit(
                build, m,
                lambda b, h: self._rebase_guard(b, h, [], check_schema=False),
                epoch=epoch, batch_id=batch_id,
            )
            if final is None:
                return {"skipped": True, "reason": "already committed"}
            version = final["version"]
        else:
            commit = build(m)
            staged = self._stage(commit, self._stage_occ(
                m, mode="ledger", read_buckets=[],
                manifest_extra=manifest_extra, staged_commit=commit,
            ))
            version = commit["version"]
        return {
            "skipped": False,
            "staged": staged,
            "touched_buckets": [],
            "version": version,
        }

    def commit_empty(
        self,
        *,
        epoch: str,
        batch_id: int,
        widen: list[dict[str, Any]] | None = None,
    ) -> dict[str, Any]:
        """Ledger-only commit: record (epoch, batch_id) in the manifest
        with no data written — the same bookkeeping merge's
        statically-empty branch does, but callable even before the
        table has a schema. Derived-table maintainers use this to make
        verifiably-no-op batches replay-skippable through the ONE
        ledger (no side marker files).

        ``widen`` optionally appends nullable fields (Spark schema-JSON
        field dicts) to the manifest schema — the additive-only union
        merge performs, without data. Join/star views use it when a
        dim's schema appears in a batch that touches no fact rows:
        existing files simply surface nulls for the new columns on
        read. Ignored while the table has no schema (nothing to read
        yet; the first data merge records the full schema)."""
        m = self.manifest()
        if [epoch, batch_id] in m["committed"]:
            return {"skipped": True, "reason": "already committed"}

        def build(mbase):
            commit = dict(mbase)
            if widen and mbase["schema"] is not None:
                seen = {f["name"] for f in mbase["schema"]["fields"]}
                add = [dict(f, nullable=True) for f in widen
                       if f["name"] not in seen]
                if add:
                    commit["schema"] = {
                        **mbase["schema"],
                        "fields": mbase["schema"]["fields"] + add,
                    }
            commit["version"] = mbase["version"] + 1
            commit["committed"] = mbase["committed"] + [[epoch, batch_id]]
            commit["n_buckets"] = self.n_buckets
            commit["key_cols"] = self.key_cols
            self._carry_forward(commit, mbase, None)
            return commit

        final = self._publish_commit(
            build, m,
            lambda b, h: self._rebase_guard(b, h, [], check_schema=False),
            epoch=epoch, batch_id=batch_id,
        )
        if final is None:
            return {"skipped": True, "reason": "already committed"}
        return {
            "skipped": False,
            "staged": None,
            "touched_buckets": [],
            "version": final["version"],
        }

    def merge(
        self,
        updates: DataFrame,
        *,
        epoch: str = "default",
        batch_id: int = 0,
        delete_col: str = "__is_delete",
        lineage: list[dict] | None = None,
        pre_commit=None,
        publish: bool = True,
        manifest_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Upsert/delete ``updates`` into the table (see ``_merge_once``
        for the full contract). Multi-writer OCC retry shell: when a
        concurrent commit invalidated what this merge read (cheap
        metadata rebase refused — see ``_publish_commit``), re-run the
        whole merge against the new head, up to ``max_commit_retries``
        times. ``updates`` is a lazy plan, so the re-run recomputes it
        against the same inputs; the abandoned attempt's files are
        orphans for ``vacuum``. The (epoch, batch_id) ledger makes the
        retry exactly-once whichever writer lands it."""
        from transforms_for_apache_kafka_connect_spark.errors import (
            CommitConflictException,
        )

        attempts = max(0, self.max_commit_retries) + 1
        for attempt in range(attempts):
            try:
                return self._merge_once(
                    updates, epoch=epoch, batch_id=batch_id,
                    delete_col=delete_col, lineage=lineage,
                    pre_commit=pre_commit, publish=publish,
                    manifest_extra=manifest_extra,
                )
            except CommitConflictException:
                if attempt == attempts - 1:
                    raise
                _sink_log.warning(
                    "merge conflict on %s (epoch=%s, batch_id=%s): "
                    "re-running against the new head (attempt %d/%d)",
                    self.root, epoch, batch_id, attempt + 2, attempts,
                )
                # jittered exponential backoff: under N-way contention
                # every writer's attempt is a full Spark job, so losers
                # re-colliding in lockstep can starve one of them; the
                # jitter spreads the re-runs out while winners drain
                time.sleep(random.uniform(0, min(8.0, 0.2 * 2 ** attempt)))
        raise AssertionError("unreachable")

    def _merge_once(
        self,
        updates: DataFrame,
        *,
        epoch: str = "default",
        batch_id: int = 0,
        delete_col: str = "__is_delete",
        lineage: list[dict] | None = None,
        pre_commit=None,
        publish: bool = True,
        manifest_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Upsert/delete ``updates`` (≤1 row per key — run lww_dedupe
        first) into the table; exactly-once keyed on (epoch, batch_id).

        ``manifest_extra`` = engine-level key/values recorded in the
        commit's manifest under ``extra`` (e.g. the bootstrap snapshot
        LSN); carried forward by every later commit.

        ``publish=False`` = write-audit-publish: the commit is fully
        written but STAGED (no CURRENT move, batch not yet in the
        ledger); the returned ``staged`` token can be audited with
        ``read_staged`` and made live with ``publish(token)``.

        ``pre_commit`` (optional callable) runs after the data files are
        written but BEFORE the manifest swap: raising there aborts the
        commit — the new files stay orphaned and the batch uncommitted,
        so a later replay redoes it (the engine uses this for the
        batch-fail error contract without paying an extra job). It is
        called with one argument: the number of update rows this merge
        saw (``int``, or ``None`` when unknown in dense mode), so the
        caller can decide whether a missing-metrics condition is a
        benign empty batch or a real failure.

        Returns the commit record (no-op dict if already committed).
        """
        m = self.manifest()
        if [epoch, batch_id] in m["committed"]:
            return {"skipped": True, "reason": "already committed"}
        if self.schema_mode == "strict" and m["schema"] is not None:
            known = {f["name"] for f in m["schema"]["fields"]}
            new_cols = [
                c for c in updates.columns
                if c not in known and c != delete_col
            ]
            if new_cols:
                from transforms_for_apache_kafka_connect_spark.errors import (
                    SchemaEnforcementError,
                )

                # fails BEFORE any write: the batch stays uncommitted
                # and replayable after an explicit migration
                raise SchemaEnforcementError(
                    f"schema_mode='strict': update columns {new_cols} "
                    f"are not in the table schema — evolve explicitly "
                    f"(schema_mode='evolve') or drop the columns"
                )

        spark = updates.sparkSession
        # numeric type evolution BEFORE bucketing: xxhash64 is
        # type-sensitive (hash(int 5) != hash(long 5)), so an update
        # frame whose key column drifted narrower than the manifest
        # type MUST be cast up before the bucket expression or the same
        # logical key lands in a different bucket and LWW silently
        # splits. Non-key columns cast up too (files are never narrower
        # than the manifest); manifest-widening clashes are resolved in
        # each strategy's schema union (COW gets it free from Spark's
        # union coercion). Incompatible/lossy drifts raise here, before
        # any write.
        updates, widen_map = self._widen_updates(m, updates, delete_col)
        upd = updates.withColumn(BUCKET_COL, _bucket_expr(self.key_cols, self.n_buckets))

        # change capture consumes the update set one extra time; in the
        # one mode where nothing else persists it (dense + shuffle or
        # dense + append) pin it so chain+dedupe don't recompute
        chg_cache = None
        if (
            self.changelog
            and not self.discovery
            and self.merge_strategy != "broadcast"
        ):
            # keep a handle on the EXACT persisted plan: the dense
            # branch later rebinds upd to an observe() wrapper whose
            # plan does not sameResult the cached child, so
            # unpersisting the wrapper would silently leak the cache
            upd = upd.persist()
            chg_cache = upd

        obs = None
        if self.discovery:
            # post-LWW updates are ≤1 row/key — small relative to raw
            # events — and are consumed twice (bucket discovery, then the
            # merge join): persist to avoid recomputing chain+dedupe
            upd = upd.persist()
            lsn_col = "_lsn" if "_lsn" in upd.columns else None
            touched_rows = (
                upd.groupBy(BUCKET_COL)
                .agg(
                    F.count("*").alias("n_updates"),
                    F.sum(F.col(delete_col).cast("long")).alias("n_deletes"),
                    (F.min(lsn_col) if lsn_col else F.lit(None)).alias("min_lsn"),
                    (F.max(lsn_col) if lsn_col else F.lit(None)).alias("max_lsn"),
                )
                .collect()
            )
            touched: list[int] | None = sorted(
                int(r[BUCKET_COL]) for r in touched_rows
            )
            n_upd: int | None = sum(int(r["n_updates"]) for r in touched_rows)
            if not touched:
                upd.unpersist()
                return self._commit_ledger_only(
                    m, upd, delete_col, epoch=epoch, batch_id=batch_id,
                    manifest_extra=manifest_extra, pre_commit=pre_commit,
                    publish=publish,
                )
        else:
            # dense-update mode: one job total — lineage via Observation
            from pyspark.sql import Observation

            if _is_statically_empty(upd):
                # a statically-empty batch (e.g. an empty micro-batch)
                # must be short-circuited here: Catalyst's
                # PropagateEmptyRelation would prune the CollectMetrics
                # node below, making Observation.get unretrievable
                # (toPyRow assertion) AND the broadcast anti-join would
                # rewrite every survivor row for a no-op. Commit only
                # the ledger entry instead.
                return self._commit_ledger_only(
                    m, upd, delete_col, epoch=epoch, batch_id=batch_id,
                    manifest_extra=manifest_extra, pre_commit=pre_commit,
                    publish=publish,
                )

            touched = None
            n_upd = None
            obs = Observation(f"merge_{epoch}_{batch_id}")
            _lsn_metrics = (
                [
                    F.min("_lsn").alias("min_lsn"),
                    F.max("_lsn").alias("max_lsn"),
                ]
                if "_lsn" in upd.columns
                else []
            )
            upd = upd.observe(
                obs,
                F.count(F.lit(1)).alias("n_updates"),
                F.sum(F.col(delete_col).cast("long")).alias("n_deletes"),
                *_lsn_metrics,
            )
            if self.merge_strategy == "broadcast":
                # the broadcast build materializes upd once; cache it so
                # the write job doesn't recompute chain+dedupe
                upd = upd.persist()

        payload_cols = [
            c for c in upd.columns if c not in (*self.key_cols, delete_col, BUCKET_COL)
        ]

        if self.merge_strategy == "append":
            return self._merge_append(
                m, upd, touched=touched, n_upd=n_upd, obs=obs,
                touched_rows=touched_rows if self.discovery else None,
                epoch=epoch, batch_id=batch_id, delete_col=delete_col,
                lineage=lineage, pre_commit=pre_commit, publish=publish,
                manifest_extra=manifest_extra, _cache=chg_cache,
                widen_map=widen_map,
            )

        have_target = bool(m["buckets"]) and (
            touched is None or any(str(b) in m["buckets"] for b in touched)
        )
        if have_target and self.merge_strategy == "broadcast":
            tgt = self.read(spark, buckets=touched).withColumn(
                BUCKET_COL, _bucket_expr(self.key_cols, self.n_buckets)
            )
            # MERGE as broadcast anti-join: target rows whose key is NOT
            # updated stream straight from scan to write (zero exchange);
            # upserts are unioned in. Deletes fall out naturally: their
            # keys are anti-joined away and they are not re-inserted.
            keys = F.broadcast(upd.select(*self.key_cols))
            survivors = tgt.join(keys, on=self.key_cols, how="left_anti")
            # survivors stream scan->write with no exchange; the (small,
            # already-persisted) upsert side is repartitioned by bucket so
            # the partitionBy writer emits at most one new file per
            # touched bucket instead of (#shuffle-tasks x #buckets) tiny
            # files — unbounded file growth would make every later
            # batch's survivors scan (and its listing) slower
            upserts = (
                upd.filter(~F.col(delete_col))
                .drop(delete_col)
                .repartition(self.n_buckets, F.col(BUCKET_COL))
            )
            merged = survivors.unionByName(upserts, allowMissingColumns=True)
        elif have_target:
            tgt = self.read(spark, buckets=touched).withColumn(
                BUCKET_COL, _bucket_expr(self.key_cols, self.n_buckets)
            )
            tgt_payload = [c for c in tgt.columns if c not in (*self.key_cols, BUCKET_COL)]
            all_payload = tgt_payload + [c for c in payload_cols if c not in tgt_payload]
            s, t = upd.alias("s"), tgt.alias("t")
            joined = t.join(s, on=self.key_cols, how="full_outer")

            def pick(c: str):
                s_has = c in payload_cols
                t_has = c in tgt_payload
                s_c = F.col(f"s.{c}") if s_has else F.lit(None)
                t_c = F.col(f"t.{c}") if t_has else F.lit(None)
                # source row present -> source wins (upsert); else keep target
                return F.when(F.col(f"s.{delete_col}").isNotNull(), s_c).otherwise(t_c).alias(c)

            merged = joined.select(
                *[F.col(c) for c in self.key_cols],
                *[pick(c) for c in all_payload],
                F.coalesce(F.col(f"s.{BUCKET_COL}"), F.col(f"t.{BUCKET_COL}")).alias(BUCKET_COL),
                F.coalesce(F.col(f"s.{delete_col}"), F.lit(False)).alias(delete_col),
            ).filter(~F.col(delete_col)).drop(delete_col)
        else:
            merged = upd.filter(~F.col(delete_col)).drop(delete_col)

        version = m["version"] + 1
        # per-ATTEMPT unique dir (OCC): two writers that both built
        # against the same base predict the same next version, and a
        # shared deterministic dir + mode=overwrite would let the claim
        # LOSER destroy the claim winner's just-committed files. Each
        # attempt writes its own directory; the losing attempt's files
        # are orphans vacuum reclaims. A crashed attempt that already
        # claimed its manifest keeps its (intact) files and is adopted
        # by the retry via _swap's same-ledger-tail rule.
        rel_dir = os.path.join(
            "data", f"v{version:08d}-b{batch_id}-w{uuid.uuid4().hex[:8]}"
        )
        if not publish:
            # staged (WAP) commits don't own a version yet: two stages
            # can predict the same next version + batch_id. Unique dir
            # per stage (as above); publish() adopts it as-is.
            rel_dir += f"-stage{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.root, rel_dir)

        # target file sizing: estimate merged rows from prior stats
        prev_rows = (m.get("stats") or {}).get("total_rows", 0)
        est_rows = prev_rows + (n_upd if n_upd is not None else 0)
        n_files = max(1, -(-max(est_rows, 1) // self.target_rows_per_file))
        from pyspark.sql import Observation as _Obs

        obs_out = _Obs(f"rows_{epoch}_{batch_id}")
        merged = merged.observe(obs_out, F.count(F.lit(1)).alias("total_rows"))
        writer_df = merged
        if self.merge_strategy != "broadcast":
            n_touched = len(touched) if touched is not None else self.n_buckets
            # never cap the write stage below the cluster's parallelism:
            # one-task-per-bucket writes equalize small and large
            # clusters (a scaling killer); compaction-by-rewrite absorbs
            # the extra files on the next merge of the bucket
            par = spark.sparkContext.defaultParallelism
            n_files = max(n_files, -(-par // n_touched))
            # split key lets an oversized bucket fan out across n_files
            split = F.pmod(
                F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(n_files)
            )
            writer_df = merged.repartition(
                n_touched * n_files, F.col(BUCKET_COL), split
            )
        # broadcast strategy: NO repartition — survivors keep their scan
        # partitioning (file packing bounds task count), upserts keep the
        # dedupe partitioning; maxRecordsPerFile enforces target sizing
        (
            writer_df.write.mode("overwrite")
            .option("maxRecordsPerFile", self.target_rows_per_file)
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        if self.changelog:
            self._write_changes(
                spark, m, upd, touched=touched,
                epoch=epoch, batch_id=batch_id, delete_col=delete_col,
            )
        if self.discovery or self.merge_strategy == "broadcast":
            upd.unpersist()
        elif chg_cache is not None:
            chg_cache.unpersist()

        written = _list_written(out_dir, rel_dir)

        def _new_buckets(mbase):
            if touched is not None:
                nb = dict(mbase["buckets"])
                for b in touched:
                    if b in written:
                        nb[str(b)] = written[b]
                    else:
                        nb.pop(str(b), None)  # bucket fully deleted
                return nb
            # full rewrite: the fresh listing IS the table
            return {str(b): fs for b, fs in written.items()}

        new_buckets = _new_buckets(m)

        total_rows = None
        try:
            total_rows = int(obs_out.get["total_rows"])
        except Exception:
            pass
        n_upd, dense_lsn_range = _harvest_dense_obs(obs, n_upd)

        if self.discovery:
            # per-partition lineage (north_rule): bucket, counts, lsn range
            lineage_rows = [
                {
                    "epoch": epoch,
                    "batch_id": batch_id,
                    "bucket": int(r[BUCKET_COL]),
                    "n_updates": int(r["n_updates"]),
                    "n_deletes": int(r["n_deletes"] or 0),
                    "min_lsn": r["min_lsn"],
                    "max_lsn": r["max_lsn"],
                }
                for r in touched_rows
            ]
        else:
            # dense mode: one lineage row for the batch, lsn range from
            # the same Observation the counts ride (no extra job)
            lineage_rows = [
                {"epoch": epoch, "batch_id": batch_id, "bucket": None,
                 "n_updates": n_upd, **dense_lsn_range}
            ]

        merged_schema = json.loads(merged.drop(BUCKET_COL).schema.json())

        def build(mbase):
            schema = merged_schema
            if mbase["schema"] is not None:
                # untouched buckets keep their old files, so the
                # manifest schema must remain a superset of theirs
                # (additive-only evolution): e.g. a MoR table's
                # _deleted marker column must survive a COW rewrite of
                # a subset of buckets, or reads of the remaining delta
                # files would null it out and resurface deleted rows.
                # Merged-side field defs win on name clashes (type
                # widening flows forward); old-only fields append.
                merged_names = {f["name"] for f in schema["fields"]}
                schema = {
                    **schema,
                    "fields": schema["fields"]
                    + [
                        f for f in mbase["schema"]["fields"]
                        if f["name"] not in merged_names
                    ],
                }
            commit = {
                "version": mbase["version"] + 1,
                "buckets": _new_buckets(mbase),
                "committed": mbase["committed"] + [[epoch, batch_id]],
                "lineage": mbase["lineage"] + (lineage or []) + lineage_rows,
                "schema": schema,
                "stats": {
                    "total_rows": total_rows
                    if total_rows is not None
                    else est_rows
                },
                "n_buckets": self.n_buckets,
                "key_cols": self.key_cols,
                # a COW merge over a table that ever saw an append-mode
                # (merge-on-read) commit must keep resolving reads:
                # only the touched buckets were rewritten, untouched
                # ones still hold unresolved delta files. Re-resolving
                # already-resolved buckets is idempotent (keys are
                # unique post-merge).
                "mor": mbase.get("mor", False),
            }
            self._carry_forward(commit, mbase, manifest_extra)
            return commit

        if pre_commit is not None:
            # may raise -> batch stays uncommitted (replayable)
            pre_commit(n_upd)
        staged = None
        if publish:
            # OCC: the rewrite only READ the touched buckets (None =
            # dense full rewrite read everything), so the commit
            # rebases over any interleaved commit that left those
            # buckets and the schema untouched
            final = self._publish_commit(
                build, m,
                lambda b, h: self._rebase_guard(b, h, touched),
                epoch=epoch, batch_id=batch_id,
            )
            if final is None:
                return {"skipped": True, "reason": "already committed"}
            version = final["version"]
        else:
            commit = build(m)
            staged = self._stage(commit, self._stage_occ(
                m, mode="cow", read_buckets=touched,
                manifest_extra=manifest_extra,
            ))
            version = commit["version"]
        return {
            "skipped": False,
            "version": version,
            "staged": staged,
            "touched_buckets": touched if touched is not None else "all",
            "n_updates": n_upd,
            "total_rows": total_rows,
        }
