"""Zone-map data skipping: per-file column min/max harvested from
parquet footers into the manifest at commit, file pruning in
read(where=...), and point lookup() via bucket + zone-map pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer


def _env(spark, rows):
    return spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>>, "
        "timestamp long, headers map<string,string>",
    )


def _seed(spark, root, *, strategy="shuffle", n=64):
    table = LakeTable(
        str(root), n_buckets=8,
        discovery=(strategy != "broadcast"), merge_strategy=strategy,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    rows = [
        ("t", 0, (f"r{i % 4}", f"p{i}"), ("c", i + 1, i + 1, (f"v{i}",)),
         i + 1, None)
        for i in range(n)
    ]
    rep.apply_batch(_env(spark, rows), 0)
    return table


def test_stats_harvested_into_manifest(spark, tmp_path):
    table = _seed(spark, tmp_path / "t")
    m = table.manifest()
    stats = m["file_stats"]
    files = [f for fs in m["buckets"].values() for f in fs]
    assert set(stats) == set(files)
    # every file carries lsn + string-key zone maps
    some = stats[files[0]]
    assert "_lsn" in some and "repo" in some and "path" in some
    mn, mx = some["_lsn"]
    assert isinstance(mn, int) and mn <= mx


def test_where_prunes_files_and_matches_full_scan(spark, tmp_path):
    table = _seed(spark, tmp_path / "t")
    full = table.read(spark).filter(F.col("_lsn") >= 60).collect()
    pruned = table.read(spark, where=[("_lsn", ">=", 60)]).collect()
    assert sorted(r["path"] for r in pruned) == sorted(
        r["path"] for r in full
    )
    assert table.last_prune["files_read"] < table.last_prune["files_total"]

    # equality on a key col
    one = table.read(spark, where=[("path", "==", "p7")]).collect()
    assert len(one) == 1 and one[0]["content"] == "v7"
    assert table.last_prune["files_read"] < table.last_prune["files_total"]


def test_where_validates_conditions(spark, tmp_path):
    table = _seed(spark, tmp_path / "t", n=4)
    with pytest.raises(ValueError, match="col, op, value"):
        table.read(spark, where=[("path", "like", "p%")])


def test_lookup_point_read(spark, tmp_path):
    table = _seed(spark, tmp_path / "t")
    got = table.lookup(spark, {"repo": "r1", "path": "p9"}).collect()
    assert len(got) == 1 and got[0]["content"] == "v9"
    # lookup scanned a single bucket's surviving files
    assert table.last_prune["files_read"] <= table.last_prune["files_total"]
    assert table.lookup(spark, {"repo": "r1", "path": "nope"}).count() == 0
    with pytest.raises(ValueError, match="must bind exactly"):
        table.lookup(spark, {"repo": "r1"})


def test_mor_prunes_only_key_columns(spark, tmp_path):
    # key p0 starts with lsn 1 (low) and is updated with lsn 100 (high);
    # a zone-map prune on _lsn >= 100 would drop the base file but keep
    # the delta — which LWW-resolves fine — but the dangerous direction
    # is a predicate matching the OLD version only: _lsn <= 1 must NOT
    # resurrect the superseded row. MoR restricts pruning to key
    # columns and filters after resolution, so the result is empty.
    table = LakeTable(
        str(tmp_path / "mor"), n_buckets=4,
        discovery=True, merge_strategy="append",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    rep.apply_batch(
        _env(spark, [
            ("t", 0, ("r0", "p0"), ("c", 1, 1, ("old",)), 1, None),
        ]),
        0,
    )
    rep.apply_batch(
        _env(spark, [
            ("t", 0, ("r0", "p0"), ("u", 100, 100, ("new",)), 100, None),
        ]),
        1,
    )
    assert table.read(spark, where=[("_lsn", "<=", 1)]).count() == 0
    # <=/< never prunes on MoR — every file must be read
    assert table.last_prune["files_read"] == table.last_prune["files_total"]
    got = table.read(spark, where=[("_lsn", ">=", 100)]).collect()
    assert len(got) == 1 and got[0]["content"] == "new"
    # >=/> IS monotone-safe on the resolution column: the cold delta
    # file (lsn range [1,1]) is skipped
    assert table.last_prune["files_read"] < table.last_prune["files_total"]
    # key-column pruning still applies on MoR
    one = table.read(spark, where=[("path", "==", "p0")]).collect()
    assert len(one) == 1 and one[0]["content"] == "new"


def test_stats_carry_forward_across_commits(spark, tmp_path):
    table = _seed(spark, tmp_path / "t", n=16)
    v1_stats = dict(table.manifest()["file_stats"])
    rep = Replayer(table=table, chain=Chain([]), epoch="e2", unique_lsn=True)
    rep.apply_batch(
        _env(spark, [
            ("t", 0, ("r0", "p0"), ("u", 1000, 1000, ("vnew",)), 1000, None),
        ]),
        0,
    )
    m = table.manifest()
    files = {f for fs in m["buckets"].values() for f in fs}
    assert set(m["file_stats"]) == files
    # untouched buckets kept their old (carried-forward) stats objects
    untouched = [f for f in files if f in v1_stats]
    assert untouched and all(m["file_stats"][f] == v1_stats[f] for f in untouched)


def test_collect_stats_off(spark, tmp_path):
    table = LakeTable(
        str(tmp_path / "ns"), n_buckets=4, collect_stats=False,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    rep.apply_batch(
        _env(spark, [
            ("t", 0, ("r0", "p0"), ("c", 1, 1, ("v",)), 1, None),
        ]),
        0,
    )
    assert "file_stats" not in table.manifest()
    # where still works (filter-only, no pruning)
    assert table.read(spark, where=[("path", "==", "p0")]).count() == 1


def _clustering_table(spark, root, *, sort):
    """One bucket, 120 keys, tiny target files -> compaction writes
    many files; with sort they carry disjoint (repo, path) ranges."""
    table = LakeTable(
        str(root), n_buckets=1, discovery=True,
        merge_strategy="shuffle", target_rows_per_file=12,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    rows = [
        ("t", 0, (f"r{(i * 53) % 120:03d}", f"p{(i * 53) % 120:03d}"),
         ("c", i + 1, i + 1, (f"v{i}",)), i + 1, None)
        for i in range(120)
    ]
    rep.apply_batch(_env(spark, rows), 0)
    table.compact(spark, all_buckets=True, sort=sort)
    return table


def test_sorted_compaction_clusters_files(spark, tmp_path):
    table = _clustering_table(spark, tmp_path / "sorted", sort=True)
    m = table.manifest()
    files = m["buckets"]["0"]
    assert len(files) >= 5  # 120 rows / 12 per file
    # sorted rewrite => pairwise-disjoint repo ranges across the files
    ranges = sorted(m["file_stats"][f]["repo"] for f in files)
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b
    # a point lookup reads exactly ONE file out of the whole bucket
    for k in ("r000", "r059", "r119"):
        got = table.lookup(spark, {"repo": k, "path": "p" + k[1:]}).collect()
        assert len(got) == 1
        assert table.last_prune == {
            "files_total": len(files), "files_read": 1,
        }


def test_unsorted_compaction_is_the_baseline(spark, tmp_path):
    table = _clustering_table(spark, tmp_path / "unsorted", sort=False)
    files = table.manifest()["buckets"]["0"]
    assert len(files) >= 5
    # hash-ordered input: key ranges overlap, lookups touch many files
    reads = []
    for k in ("r000", "r059", "r119"):
        table.lookup(spark, {"repo": k, "path": "p" + k[1:]}).collect()
        reads.append(table.last_prune["files_read"])
    assert max(reads) > 1


def test_rescale_clusters_files(spark, tmp_path):
    table = _clustering_table(spark, tmp_path / "resc", sort=False)
    table = LakeTable(
        str(tmp_path / "resc"), n_buckets=1, discovery=True,
        merge_strategy="shuffle", target_rows_per_file=12,
    )
    table.rescale(spark, 2)
    m = table.manifest()
    for b, files in m["buckets"].items():
        if len(files) < 2:
            continue
        ranges = sorted(m["file_stats"][f]["repo"] for f in files)
        for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
            assert hi_a <= lo_b


def _bloom_table(spark, root, *, n_batches=4):
    """Merge-on-read deltas where EVERY file of a bucket spans the same
    (repo, path) zone-map range — batch b pairs repo r_i with path
    p_{(i+b)%24}, so min/max are identical across files and only the
    Bloom sidecars can tell which delta file holds a given pairing."""
    table = LakeTable(
        str(root), n_buckets=2, discovery=True,
        merge_strategy="append", collect_blooms=True,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    for b in range(n_batches):
        rows = [
            ("t", 0, (f"r{i:02d}", f"p{(i + b) % 24:02d}"),
             ("c", b * 1000 + i + 1, b * 1000 + i + 1, (f"v{b}.{i}",)),
             b * 1000 + i + 1, None)
            for i in range(24)
        ]
        rep.apply_batch(_env(spark, rows), b)
    return table


def test_bloom_sidecars_prune_point_reads(spark, tmp_path):
    import os

    table = _bloom_table(spark, tmp_path / "t")
    m = table.manifest()
    files = [f for fs in m["buckets"].values() for f in fs]
    assert set(m["file_blooms"]) == set(files)
    for f in files:
        assert os.path.exists(table._abs(f) + ".bloom")
    # the batch-2 pairing (r07, p09) lives in one delta file per
    # bucket — blooms skip the other batches' files even though every
    # file's (repo, path) zone-map range is identical
    got = table.lookup(spark, {"repo": "r07", "path": "p09"}).collect()
    assert len(got) == 1 and got[0]["content"] == "v2.7"
    assert table.last_prune["files_read"] < table.last_prune["files_total"]
    # no false negatives: every pairing of every batch still resolves
    for b in (0, 3):
        for i in (0, 23):
            got = table.lookup(
                spark,
                {"repo": f"r{i:02d}", "path": f"p{(i + b) % 24:02d}"},
            ).collect()
            assert len(got) == 1, (b, i)
    # an absent key is (almost surely) proven absent without a scan
    table.lookup(spark, {"repo": "nope", "path": "nope"}).collect()
    assert table.last_prune["files_read"] <= 1


def test_bloom_sidecars_follow_vacuum(spark, tmp_path):
    import glob
    import os

    table = _bloom_table(spark, tmp_path / "t", n_batches=2)
    old_files = [
        f for fs in table.manifest()["buckets"].values() for f in fs
    ]
    table.compact(spark, all_buckets=True)
    r = table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert r["deleted_files"] > 0
    for f in old_files:
        assert not os.path.exists(table._abs(f) + ".bloom")
    m = table.manifest()
    live = [f for fs in m["buckets"].values() for f in fs]
    for f in live:
        assert os.path.exists(table._abs(f) + ".bloom")
    assert set(m["file_blooms"]) == set(live)
    # every sidecar on disk belongs to a live file
    live_abs = {table._abs(f) for f in live}
    for s in glob.glob(str(tmp_path / "t" / "data" / "**" / "*.bloom"),
                       recursive=True):
        assert s[: -len(".bloom")] in live_abs


def test_bloom_pruning_without_writer_flag(spark, tmp_path):
    """A lookup-only process (collect_blooms unset) still uses the
    sidecars an ingest process built — pruning gates on the manifest,
    not on this process's writer config."""
    _bloom_table(spark, tmp_path / "t")
    reader = LakeTable(str(tmp_path / "t"), n_buckets=2)
    got = reader.lookup(spark, {"repo": "r07", "path": "p09"}).collect()
    assert len(got) == 1 and got[0]["content"] == "v2.7"
    assert reader.last_prune["files_read"] < reader.last_prune["files_total"]


def test_bloom_negative_marker_for_nonstring_keys(spark, tmp_path):
    """Int-keyed tables memoize 'no bloom possible' per file instead of
    re-reading every live file on every commit."""
    from unittest import mock

    import transforms_for_apache_kafka_connect_spark.streaming.sink as sink_mod

    table = LakeTable(
        str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
        collect_blooms=True,
    )
    df = spark.range(50).select(
        F.col("id").alias("k"), F.lit("x").alias("v"),
        F.lit(1).alias("_lsn"), F.lit(False).alias("__is_delete"),
    )
    table.merge(df, epoch="e", batch_id=0)
    m = table.manifest()
    files = [f for fs in m["buckets"].values() for f in fs]
    assert all(m["file_blooms"][f] == {"m": 0} for f in files)
    # second commit must not re-probe the memoized files
    with mock.patch.object(
        sink_mod, "_build_bloom_sidecar", wraps=sink_mod._build_bloom_sidecar
    ) as probe:
        table.merge(
            df.withColumn("k", F.col("k") + 100), epoch="e", batch_id=1
        )
        probed = {c.args[0] for c in probe.call_args_list}
    assert not (probed & set(files))
    # lookups on the marker still read the file (exactness preserved)
    got = table.lookup(spark, {"k": 7}).collect()
    assert len(got) == 1


def test_stats_filtered_not_rebuilt_when_flag_off(spark, tmp_path):
    """A maintaining process without collect flags filters carried
    stats/blooms to live files — no stale deleted-file entries."""
    table = _bloom_table(spark, tmp_path / "t", n_batches=2)
    plain = LakeTable(
        str(tmp_path / "t"), n_buckets=2,
        collect_stats=False, collect_blooms=False,
    )
    plain.compact(spark, all_buckets=True)
    m = plain.manifest()
    live = {f for fs in m["buckets"].values() for f in fs}
    assert set(m.get("file_stats", {})) <= live
    assert set(m.get("file_blooms", {})) <= live


# ------------------------------------------------------- lookup_many


def test_lookup_many_matches_individual_lookups(spark, tmp_path):
    table = _seed(spark, tmp_path / "t")
    keys = [
        {"repo": "r1", "path": "p9"},
        {"repo": "r2", "path": "p2"},
        {"repo": "r0", "path": "p60"},
        {"repo": "rX", "path": "nope"},  # absent
    ]
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in table.lookup_many(spark, keys).collect()
    }
    want = {}
    for k in keys:
        for r in table.lookup(spark, k).collect():
            want[(r["repo"], r["path"])] = r["content"]
    assert got == want and len(got) == 3


def test_lookup_many_validates(spark, tmp_path):
    table = _seed(spark, tmp_path / "t", n=4)
    with pytest.raises(ValueError, match="at least one key"):
        table.lookup_many(spark, [])
    with pytest.raises(ValueError, match="must bind exactly"):
        table.lookup_many(spark, [{"repo": "r0"}])


def test_lookup_many_prunes_to_probed_buckets_and_files(spark, tmp_path):
    table = _clustering_table(spark, tmp_path / "sorted", sort=True)
    n_files = len(table.manifest()["buckets"]["0"])
    keys = [
        {"repo": "r000", "path": "p000"},
        {"repo": "r119", "path": "p119"},
    ]
    got = table.lookup_many(spark, keys).collect()
    assert len(got) == 2
    # key-clustered files: the two probes touch at most one file each
    assert table.last_prune["files_total"] == n_files
    assert table.last_prune["files_read"] <= 2 < n_files


def test_lookup_many_bloom_pruning_on_mor_deltas(spark, tmp_path):
    table = _bloom_table(spark, tmp_path / "t")
    keys = [
        {"repo": "r07", "path": "p09"},  # batch-2 pairing
        {"repo": "r00", "path": "p03"},  # batch-3 pairing
    ]
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in table.lookup_many(spark, keys).collect()
    }
    assert got == {("r07", "p09"): "v2.7", ("r00", "p03"): "v3.0"}
    # identical zone-map ranges per bucket -> only blooms prune
    assert table.last_prune["files_read"] < table.last_prune["files_total"]


def test_lookup_many_mor_delete_not_resurrected(spark, tmp_path):
    table = LakeTable(
        str(tmp_path / "mor"), n_buckets=4,
        discovery=True, merge_strategy="append",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    rep.apply_batch(
        _env(spark, [
            ("t", 0, ("r0", "p0"), ("c", 1, 1, ("old",)), 1, None),
            ("t", 0, ("r0", "p1"), ("c", 2, 2, ("live",)), 2, None),
        ]),
        0,
    )
    rep.apply_batch(
        _env(spark, [
            ("t", 0, ("r0", "p0"), ("d", 100, 100, None), 100, None),
        ]),
        1,
    )
    got = table.lookup_many(
        spark,
        [{"repo": "r0", "path": "p0"}, {"repo": "r0", "path": "p1"}],
    ).collect()
    assert len(got) == 1 and got[0]["content"] == "live"


# ------------------------------------------------------------- stats


def test_table_stats_summary(spark, tmp_path):
    table = _seed(spark, tmp_path / "t")
    s = table.stats()
    m = table.manifest()
    n_files = sum(len(fs) for fs in m["buckets"].values())
    assert s["version"] == m["version"]
    assert s["n_buckets"] == 8 and s["key_cols"] == ["repo", "path"]
    assert s["total_files"] == n_files and s["total_bytes"] > 0
    assert s["mor"] is False
    assert s["committed_batches"] == 1
    assert s["zone_mapped_files"] == n_files
    assert s["bloom_files"] == 0
    assert 1 <= s["nonempty_buckets"] <= 8
    assert s["max_files_per_bucket"] >= s["median_files_per_bucket"] >= 1


def test_table_stats_tracks_mor_and_blooms(spark, tmp_path):
    table = _bloom_table(spark, tmp_path / "t", n_batches=2)
    s = table.stats()
    assert s["mor"] is True
    assert s["bloom_files"] == s["total_files"] > 0
    assert s["committed_batches"] == 2
    assert s["live_versions"] >= 2


# ----------------------------------------------------------- z-order


def _env_ab(spark, rows):
    return spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<pid:bigint>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<a:bigint,b:bigint>>, "
        "timestamp long, headers map<string,string>",
    )


def _grid_table(spark, root, *, layout, n_side=64, files_per_bucket=16):
    """4096 keys on an independent (a, b) grid, 2 buckets, then a full
    clustering rewrite under the given layout. Returns the table."""
    n = n_side * n_side
    table = LakeTable(
        str(root), key_cols=["pid"], n_buckets=2,
        discovery=False, merge_strategy="broadcast",
        target_rows_per_file=n // 2 // files_per_bucket,
    )
    rows = [
        ("t", 0, (i,), ("c", i + 1, i + 1, (i % n_side, i // n_side)),
         i + 1, None)
        for i in range(n)
    ]
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    rep.apply_batch(_env_ab(spark, rows), 0)
    table.compact(
        spark, all_buckets=True, sort_cols=["a", "b"], layout=layout,
    )
    return table


def _files_read(table, spark, col, lo):
    table.read(spark, where=[(col, ">=", lo)]).count()
    p = table.last_prune
    return p["files_read"], p["files_total"]


def test_zorder_prunes_on_every_clustered_dimension(spark, tmp_path):
    """The point of z-order: a linear (a, b) sort tightens zone maps
    only on `a` — a `b` predicate scans every file; the Morton layout
    prunes substantially on BOTH, and contents are untouched."""
    zt = _grid_table(spark, tmp_path / "z", layout="zorder")
    lt = _grid_table(spark, tmp_path / "l", layout="linear")

    # content identity: clustering is layout, not data
    zrows = sorted(
        (r["pid"], r["a"], r["b"]) for r in zt.read(spark).collect()
    )
    lrows = sorted(
        (r["pid"], r["a"], r["b"]) for r in lt.read(spark).collect()
    )
    assert zrows == lrows and len(zrows) == 64 * 64

    # leading column: both layouts prune hard
    z_a, z_tot = _files_read(zt, spark, "a", 48)
    l_a, l_tot = _files_read(lt, spark, "a", 48)
    assert z_a < z_tot and l_a < l_tot

    # second column: linear reads ~everything, z-order keeps pruning
    z_b, _ = _files_read(zt, spark, "b", 48)
    l_b, _ = _files_read(lt, spark, "b", 48)
    assert l_b == l_tot  # lexicographic: b-range per file is full-width
    assert z_b <= z_tot // 2  # morton: b-range per file is a tile
    # and both-dimension predicates compose
    zt.read(
        spark, where=[("a", ">=", 48), ("b", ">=", 48)]
    ).count()
    assert zt.last_prune["files_read"] <= z_tot // 4


def test_zorder_validations(spark, tmp_path):
    table = _seed(spark, tmp_path / "t", n=8)
    with pytest.raises(ValueError, match="zorder"):
        table.compact(spark, all_buckets=True, layout="zorder")
    with pytest.raises(ValueError, match="zorder"):
        table.compact(
            spark, all_buckets=True, sort_cols=["path"], layout="zorder"
        )
    with pytest.raises(ValueError, match="linear"):
        table.compact(spark, all_buckets=True, layout="diagonal")
    from transforms_for_apache_kafka_connect_spark.streaming.sink import (
        _zorder_key,
    )

    with pytest.raises(ValueError, match="bits"):
        _zorder_key(table.read(spark), ["repo", "path"], bits=0)


def test_zorder_bits_clamped_to_long_width(spark, tmp_path):
    """Review regression: Spark's shiftleft masks the shift mod 64, so
    bits * n_cols > 63 would silently wrap high-column cells onto low
    bit positions. The key builder clamps bits instead."""
    from transforms_for_apache_kafka_connect_spark.streaming.sink import (
        _zorder_key,
    )

    cols = [f"c{i}" for i in range(11)]
    df = spark.range(64).select(
        "id", *[(F.col("id") * (i + 1) % 64).alias(c)
                for i, c in enumerate(cols)]
    )
    # 11 cols at requested bits=6 would need 66 bit positions; clamped
    # to 5 -> 55. The key must stay non-negative (no sign-bit wrap) and
    # have more distinct values than a degenerate layout would.
    keys = [r[0] for r in df.select(
        _zorder_key(df, cols, bits=6, total_rows=64)
    ).collect()]
    assert all(k >= 0 for k in keys)
    assert len(set(keys)) > 8
