"""Changelog-maintained MinHash-LSH near-duplicate index.

The batch near-dup family (functions/dedupe.py) answers "which pairs
in this CORPUS are near-duplicates" with one banded-LSH pass. A
training-data ingest pipeline asks a different question every batch:
"is this NEW document a near-dup of anything already ingested?" —
and re-running the corpus pass per batch is O(|corpus|) each time.

``NearDupIndex`` keeps the LSH index itself as DERIVED lake tables,
maintained from the base table's row-level changelog (the same
maintenance loop as incremental aggregates — attach via
``Replayer(maintain=[...])``; the engine calls ``apply_changes`` per
committed batch):

* ``bands`` table — key ``(id, band)``, value ``bh`` (the banded
  signature hash). Insert/update post-images upsert all ``bands``
  rows of the doc; deletes (and post-images whose text became
  NULL/empty) remove them. Plain rows fold EXACTLY under retraction —
  no sketch-style staleness.
* ``sigs`` table — key ``id``, value the full minhash signature, for
  signature-estimated jaccard at query time without touching text.

Query path for a batch of new docs: signature + band the batch
(O(|batch|)), equi-join its band rows against the bands table on
``(band, bh)`` — the same never-all-pairs candidate generation as
``minhash_lsh_duplicates`` — then verify candidates either by
signature estimate (index-only) or by exact jaccard against caller-
supplied corpus text. Per batch that is O(|batch| + |candidates|)
with every shuffle keyed on ``(band, bh)``; the corpus is never
rescanned and never reshuffled (the bands table arrives bucket-read,
the join build side is the banded batch).

Exactly-once: both index tables commit under the SOURCE batch's
(epoch, batch_id) through their own ledgers, so crash-replay of a
batch is a no-op — identical to every other maintained table.

Reference parity note: the reference (row-at-a-time SMTs,
Hash.java etc.) has no corpus-level operator at all; this is
engine-level capability extending SURVEY §2's dedup family to the
CDC delivery model.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dataclass_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
    band_rows as _band_rows,
)
from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
    jaccard_expr,
    minhash_signature,
    word_shingles,
)
from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

__all__ = ["NearDupIndex"]


@dataclass
class NearDupIndex:
    """LSH band + signature index over a document table, maintained
    from its changelog (module docstring)."""

    root: str
    id_col: str = "doc_id"
    text_col: str = "text"
    num_hashes: int = 32
    bands: int = 16
    n: int = 3  #: word-shingle width
    n_buckets: int = 8
    bands_table: LakeTable = dataclass_field(init=False)
    sigs_table: LakeTable = dataclass_field(init=False)

    def __post_init__(self):
        if self.num_hashes % self.bands:
            raise ValueError("num_hashes must be divisible by bands")
        self.bands_table = LakeTable(
            os.path.join(self.root, "bands"),
            key_cols=["id", "band"],
            n_buckets=self.n_buckets,
            discovery=False,
            merge_strategy="broadcast",
        )
        self.sigs_table = LakeTable(
            os.path.join(self.root, "sigs"),
            key_cols=["id"],
            n_buckets=self.n_buckets,
            discovery=False,
            merge_strategy="broadcast",
        )

    # ---------------------------------------------------- maintenance

    def _sig_expr(self):
        return minhash_signature(
            F.col(self.text_col), self.num_hashes, self.n
        )

    def apply_changes(
        self, changes: DataFrame, *, epoch: str, batch_id: int
    ) -> dict:
        """Fold one committed batch's changelog into the index
        (engine.py maintenance protocol — same signature the Replayer
        maintenance loop calls). Post-images with usable text upsert
        their band rows + signature; deletes and text-less post-images
        remove theirs."""
        posts = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        )
        # indexable = yields at least one shingle. A doc with fewer than
        # n words has an EMPTY shingle set -> an all-NULL signature ->
        # concat_ws skips NULLs and every band hashes to xxhash64('') —
        # all such docs would collide with each other in EVERY band,
        # exactly the all-pairs hotspot banding exists to avoid. They
        # leave (or never enter) the index instead, like text-less docs.
        has_text = (
            F.col(self.text_col).isNotNull()
            & (F.size(word_shingles(F.col(self.text_col), self.n)) > 0)
        )
        up = posts.filter(has_text).select(
            F.col(self.id_col).alias("id"), self._sig_expr().alias("sig")
        )
        # a doc leaves the index on delete OR when its text became
        # unusable in an update
        gone = (
            changes.filter(F.col("_change_type") == "delete")
            .select(F.col(self.id_col).alias("id"))
            .unionByName(
                posts.filter(~has_text).select(
                    F.col(self.id_col).alias("id")
                )
            )
        )
        band_up = _band_rows(up, "id", self.num_hashes, self.bands)
        band_del = gone.select(
            "id",
            F.explode(
                F.array(*[F.lit(b) for b in range(self.bands)])
            ).alias("band"),
            F.lit(None).cast("long").alias("bh"),
        )
        bands_upd = band_up.withColumn(
            "__is_delete", F.lit(False)
        ).unionByName(band_del.withColumn("__is_delete", F.lit(True)))
        sigs_upd = up.withColumn("__is_delete", F.lit(False)).unionByName(
            gone.select(
                "id",
                F.lit(None).cast(f"array<bigint>").alias("sig"),
                F.lit(True).alias("__is_delete"),
            )
        )
        return {
            "bands": self.bands_table.merge(
                bands_upd, epoch=epoch, batch_id=batch_id
            ),
            "sigs": self.sigs_table.merge(
                sigs_upd, epoch=epoch, batch_id=batch_id
            ),
        }

    # ---------------------------------------------------------- query

    def candidates(self, spark: SparkSession, docs: DataFrame) -> DataFrame:
        """Distinct (query_id, corpus_id) pairs whose signatures collide
        in >= 1 band — new docs vs the INDEX, one equi-join on
        (band, bh), corpus never rescanned."""
        q = docs.filter(
            F.col(self.text_col).isNotNull()
            & (F.size(word_shingles(F.col(self.text_col), self.n)) > 0)
        ).select(
            F.col(self.id_col).alias("query_id"),
            self._sig_expr().alias("sig"),
        )
        qb = _band_rows(q, "query_id", self.num_hashes, self.bands)
        idx = self.bands_table.read(spark)
        return (
            qb.join(idx, on=["band", "bh"])
            .filter(F.col("query_id") != F.col("id"))
            .select("query_id", F.col("id").alias("corpus_id"))
            .distinct()
        )

    def near_dups_of(
        self,
        spark: SparkSession,
        docs: DataFrame,
        *,
        threshold: float = 0.8,
        corpus: DataFrame | None = None,
    ) -> DataFrame:
        """Near-duplicates of NEW docs against the indexed corpus.

        ``corpus=None`` (index-only): candidates are verified by the
        SIGNATURE-estimated jaccard (matching minhash positions /
        num_hashes) from the sigs table — unbiased estimator, stderr
        ~= sqrt(t(1-t)/num_hashes); returns ``est_jaccard``. Passing a
        ``corpus`` frame holding (id_col, text_col) for corpus docs
        (e.g. the base table read, or a lookup of the candidate ids)
        verifies by EXACT shingle jaccard instead and returns
        ``jaccard`` — same contract as minhash_lsh_duplicates.
        """
        cands = self.candidates(spark, docs)
        qs = docs.select(
            F.col(self.id_col).alias("query_id"),
            self._sig_expr().alias("q_sig"),
            word_shingles(F.col(self.text_col), self.n).alias("q_sh"),
        )
        if corpus is None:
            cs = self.sigs_table.read(spark).select(
                F.col("id").alias("corpus_id"), F.col("sig").alias("c_sig")
            )
            est = (
                F.aggregate(
                    F.zip_with(
                        F.col("q_sig"),
                        F.col("c_sig"),
                        lambda a, b: (a == b).cast("int"),
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.lit(float(self.num_hashes))
            )
            return (
                cands.join(qs.drop("q_sh"), "query_id")
                .join(cs, "corpus_id")
                .select(
                    "query_id",
                    "corpus_id",
                    F.round(est, 6).alias("est_jaccard"),
                )
                .filter(F.col("est_jaccard") >= threshold)
            )
        cs = corpus.select(
            F.col(self.id_col).alias("corpus_id"),
            word_shingles(F.col(self.text_col), self.n).alias("c_sh"),
        )
        return (
            cands.join(qs.drop("q_sig"), "query_id")
            .join(cs, "corpus_id")
            .select(
                "query_id",
                "corpus_id",
                F.round(
                    jaccard_expr(F.col("q_sh"), F.col("c_sh")), 6
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
