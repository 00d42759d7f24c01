"""Second-wave dedup operators: set-similarity joins via PREFIX
FILTERING (the PPJoin/AllPairs family, Bayardo et al. "Scaling Up All
Pairs Similarity Search" / Xiao et al. PPJoin) — the symmetric Jaccard
join and its asymmetric containment variant.

Distinct from `dedup_ngram_jaccard`'s df-capped shared-shingle join in
one important way: the df cap is LOSSY (a true near-dup pair whose
shared shingles are all hot is silently dropped), while prefix
filtering is COMPLETE at its threshold — two sets with Jaccard >= tau
must share at least one element of their (1 - tau)-length rarest-first
prefixes, so candidate generation joins only on prefix shingles and
still guarantees every qualifying pair is found.  On the sf0.01
corpus this generates 165 candidates against 124,750 possible pairs
(756x reduction) with zero recall loss.

Both entries' completeness rests on the SAME prefix-length formula
(sz - ceil(tau * sz / 100) + 1), so it has exactly one definition per
engine below — `_prefix` (Spark) and `_DD_PREFIX_CTES` (SQL) — and the
tau constant is the only thing an entry supplies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from t_spoon_spark.operators.dedup import doc_shingle_hashes, verify_jaccard_arrays
from t_spoon_spark.queries.dedup import _DD_SH_TABLE
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

PF_TAU = 60  # Jaccard threshold, percent
CT_TAU = 80  # containment threshold, percent of the SMALLER doc's shingles


def _prefix(sh: DataFrame, sizes: DataFrame, tau: int) -> DataFrame:
    """Rarest-first prefix of each doc's shingle set at threshold tau:
    order by (global df, hash) — a total order identical in both
    engines — and keep the first sz - ceil(tau * sz / 100) + 1.  The
    pigeonhole bound: a doc sharing >= tau% of its shingles with
    another cannot miss with its whole prefix.  Returns
    (doc_id, sh_hash, sz).

    The per-doc set size rides the SAME doc_id window as the rank
    (unbounded-frame count over an identical partition spec reuses the
    one Exchange + Sort), so the separate sizes aggregation pass over
    the posting table and its join are gone from this path
    (optimization r14, guide §2.1); `sizes` stays a parameter for
    callers' other uses but is no longer read here."""
    del sizes  # kept in the signature for call-site compatibility
    freq = sh.groupBy("sh_hash").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("sh_hash"))
    w_all = Window.partitionBy("doc_id")
    ordered = (
        sh.join(freq, "sh_hash")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("sz", F.count(F.lit(1)).over(w_all).cast("long"))
    )
    return ordered.filter(
        F.col("pos") <= F.col("sz") - F.ceil((F.col("sz") * tau) / F.lit(100.0)) + 1
    )


def _dd_prefix_ctes(tau: int) -> str:
    """The SQL twin of `_prefix`: freq/ordered/pref CTEs over the
    shared `sh`/`sizes` tables of `_DD_SH_TABLE`."""
    return f"""
    freq AS (SELECT sh_hash, COUNT(*) AS df FROM sh GROUP BY sh_hash),
    ordered AS (
      SELECT s.doc_id, s.sh_hash,
             ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY f.df, s.sh_hash) AS pos
      FROM sh s JOIN freq f USING (sh_hash)
    ),
    pref AS (
      SELECT o.doc_id, o.sh_hash
      FROM ordered o JOIN sizes z USING (doc_id)
      WHERE o.pos <= z.sz - CEIL((z.sz * {tau}) / 100.0) + 1
    )"""


@register(
    "dedup_prefix_filter_jaccard",
    f"""
    {_DD_SH_TABLE},
    {_dd_prefix_ctes(PF_TAU)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pref a JOIN pref b ON a.sh_hash = b.sh_hash AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.sh_hash = a.sh_hash
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           CAST(FLOOR(n_inter * 100.0 / (za.sz + zb.sz - n_inter)) AS BIGINT) AS jaccard_c
    FROM inter
      JOIN sizes za ON za.doc_id = doc_a
      JOIN sizes zb ON zb.doc_id = doc_b
    WHERE CAST(FLOOR(n_inter * 100.0 / (za.sz + zb.sz - n_inter)) AS BIGINT) >= {PF_TAU}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless Jaccard >= 0.60 near-dup pairs via prefix filtering:
    order each doc's 3-word shingles rarest-first (global df, hash
    tiebreak — a total order identical in both engines), keep only the
    first sz - ceil(tau * sz) + 1 as the prefix, and generate
    candidates ONLY from prefix-shingle matches — completeness is the
    pigeonhole bound of the AllPairs/PPJoin family.  Exact verify over
    all shingles then closes each candidate.  Plan shape at 100 TB:
    the df table is a vocabulary-sized aggregate (map-side partial);
    prefix selection is one window per doc (partitioned by doc_id, no
    global sort); the candidate join runs on prefix shingles only —
    the shuffle volume is O(prefix postings^2 per shingle), the
    quantity the rarest-first ordering minimizes, and unlike the
    df-capped variant nothing is dropped."""
    docs = t(spark, sf_dir, "documents")
    sh = doc_shingle_hashes(docs).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    pref = _prefix(sh, sizes, PF_TAU)
    # length filter (PPJoin): Jaccard >= tau forces
    # tau * max(sz_a, sz_b) <= min(sz_a, sz_b), so candidate pairs
    # outside the size band can be pruned BEFORE the distinct with zero
    # recall loss — the completeness test pins that the output is still
    # the uncapped ground truth.
    # indexing/probing prefix asymmetry (PPJoin, optimization r15):
    # orient each unordered pair by (sz, doc_id); the SMALLER side x
    # only needs its INDEX prefix ix = sz - ceil(2*tau*sz/(100+tau)) + 1
    # in candidate generation, while the larger side y probes with the
    # full (1-tau)-prefix.  Lossless: a qualifying pair has overlap
    # I >= alpha = ceil(tau*(sx+sy)/(100+tau)) (integer I, from
    # floor(I*100/union) >= tau), its FIRST common element sits at
    # positions (px0, py0) with I <= min(sx-px0, sy-py0) + 1, so
    # px0 <= sx - alpha + 1 <= ix  (alpha >= ceil(2*tau*sx/(100+tau))
    # because sy >= sx) and py0 <= sy - alpha + 1 <= the probe prefix
    # cutoff (alpha >= ceil(tau*sy/100) because 100*sx >= tau*sy for
    # any qualifying pair — the length filter).  The index side is
    # ~(1 - 2*tau/(100+tau))/(1 - tau/100) of the probe side (0.625x
    # at tau=60), cutting the candidate join's row volume by the same
    # factor on top of r14's positional filter; the completeness gate
    # (tests/test_plans_round7.py) pins zero recall loss and the
    # output canonicalizes back to doc_a < doc_b, so the entry's
    # result is unchanged.
    ix_len = (
        F.col("sz") - F.ceil((F.col("sz") * (2 * PF_TAU)) / F.lit(100.0 + PF_TAU)) + 1
    )
    x = pref.filter(F.col("pos") <= ix_len).select(
        F.col("doc_id").alias("doc_x"),
        "sh_hash",
        F.col("sz").alias("sz_x"),
        F.col("pos").alias("pos_x"),
    )
    y = pref.select(
        F.col("doc_id").alias("doc_y"),
        "sh_hash",
        F.col("sz").alias("sz_y"),
        F.col("pos").alias("pos_y"),
    )
    # positional filter (PPJoin, optimization r14): at a match row the
    # intersection is bounded by the elements at-or-after the match in
    # BOTH docs' (identical, global) rarest-first order:
    # I <= min(sz_x - pos_x, sz_y - pos_y) + 1.  Jaccard >= tau needs
    # I*(100+tau) >= tau*(sz_x+sz_y), so rows whose bound can't reach
    # it generate no candidate.  Lossless: a true pair's FIRST common
    # element has no shared element before it, so its bound is exact
    # there and that row passes — r14 measured 193k -> 68.7k candidate
    # pairs before the exact verify (which was 3.0 s of the entry's
    # 5.6 s as pure false-positive scanning).
    pos_ok = (
        F.least(F.col("sz_x") - F.col("pos_x"), F.col("sz_y") - F.col("pos_y")) + 1
    ) * (100 + PF_TAU) >= (F.col("sz_x") + F.col("sz_y")) * PF_TAU
    ordered = (F.col("sz_x") < F.col("sz_y")) | (
        (F.col("sz_x") == F.col("sz_y")) & (F.col("doc_x") < F.col("doc_y"))
    )
    # distinct on the ORIENTED pair (doc_x, doc_y) — a deterministic
    # 1:1 image of the unordered pair — NOT on the canonical
    # (least, greatest) form: the stream side rides the rank window's
    # hash partitioning on doc_id (= doc_x), which satisfies the
    # distinct's clustering, so the dedup runs as a partial+final
    # HashAggregate pair with ZERO Exchange.  Canonicalizing first
    # replaced the partition column with least(doc_x, doc_y) and
    # re-shuffled every candidate (optimization r15, guide §2.4: the
    # +1 Exchange was visible in the captured plan).  doc_a < doc_b is
    # restored below on the verified (tiny) rows; n_inter/jaccard_c
    # are symmetric, so the declared result is unchanged.
    cand = (
        x.join(y, "sh_hash")
        .filter(
            ordered
            # length filter: with sz_x <= sz_y only this direction binds
            & (F.col("sz_x") * 100 >= F.col("sz_y") * PF_TAU)
            & pos_ok
        )
        .select("doc_x", "doc_y")
        .distinct()
        .select(F.col("doc_x").alias("doc_a"), F.col("doc_y").alias("doc_b"))
    )
    # verify over per-doc shingle ARRAYS regrouped from the (already
    # checkpointed) exploded table: on the positionally-pruned
    # candidate set this measured 0.96 s vs 1.25 s for the exploded
    # two-join + groupBy + size-join verify (optimization r14) — one
    # array_intersect expression per pair, sizes ride the same row.
    arrs = sh.groupBy("doc_id").agg(F.collect_list("sh_hash").alias("sh_arr"))
    ver = verify_jaccard_arrays(cand, arrs, "doc_id", PF_TAU)
    return ver.select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
        "n_inter",
        "jaccard_c",
    ).orderBy("doc_a", "doc_b")


@register(
    "dedup_containment_join",
    f"""
    {_DD_SH_TABLE},
    {_dd_prefix_ctes(CT_TAU)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_in, b.doc_id AS doc_out
      FROM pref a JOIN sh b ON a.sh_hash = b.sh_hash AND a.doc_id <> b.doc_id
    ),
    inter AS (
      SELECT c.doc_in, c.doc_out, COUNT(*) AS n_inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.doc_in
        JOIN sh b ON b.doc_id = c.doc_out AND b.sh_hash = a.sh_hash
      GROUP BY 1, 2
    )
    SELECT doc_in, doc_out, n_inter,
           CAST(FLOOR(n_inter * 100.0 / za.sz) AS BIGINT) AS containment_c
    FROM inter JOIN sizes za ON za.doc_id = doc_in
    WHERE CAST(FLOOR(n_inter * 100.0 / za.sz) AS BIGINT) >= {CT_TAU}
    ORDER BY doc_in, doc_out
    """,
)
def dedup_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT join: ordered pairs (doc_in, doc_out)
    where >= 80% of doc_in's 3-word shingles also appear in doc_out —
    the subsumption/quotation detector (a short doc pasted inside a
    longer one has low Jaccard but high containment, so the symmetric
    entries miss exactly the case this one exists for).  Candidate
    generation prefix-filters ONLY the contained side: if C(A->B) >=
    tau then A's rarest (sz_a - ceil(tau*sz_a) + 1) shingles cannot all
    miss B (pigeonhole), so joining A-prefixes against B's FULL posting
    list is complete at the threshold.  Scale shape: the join-key
    distribution is dictated by the prefix side, which by rarest-first
    construction holds only low-df shingles — hot shingles never enter
    a prefix, so postings on both sides of the equi-join stay short;
    the verify aggregate is map-side partial on (doc_in, doc_out).
    Reference analogue: none (LLM-pipeline family from the build
    brief); algorithm is the asymmetric variant of AllPairs/PPJoin
    prefix filtering (Bayardo et al., Xiao et al.)."""
    docs = t(spark, sf_dir, "documents")
    sh = doc_shingle_hashes(docs).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    pref = _prefix(sh, sizes, CT_TAU)
    # (no positional filter here: with only the contained side ordered,
    # the PPJoin position bound reduces to sz_in - pos + 1 >=
    # tau*sz_in/100, which the prefix-length cutoff already guarantees
    # for every prefix row — checked and left alone, optimization r14)
    a = pref.select(F.col("doc_id").alias("doc_in"), "sh_hash")
    b = sh.select(F.col("doc_id").alias("doc_out"), "sh_hash")
    # length filter, asymmetric form: C(in->out) >= tau forces
    # sz_out >= tau * sz_in (the intersection cannot exceed sz_out).
    # Applied AFTER the distinct — the candidate set is small there, so
    # two broadcast-sized size joins prune the verify join's input with
    # zero recall loss (the completeness test pins it).
    zi = sizes.select(F.col("doc_id").alias("doc_in"), F.col("sz").alias("sz_i"))
    zo = sizes.select(F.col("doc_id").alias("doc_out"), F.col("sz").alias("sz_o"))
    cand = (
        a.join(b, "sh_hash")
        .filter(F.col("doc_in") != F.col("doc_out"))
        .select("doc_in", "doc_out")
        .distinct()
        .join(zi, "doc_in")
        .join(zo, "doc_out")
        .filter(F.col("sz_o") * 100 >= F.col("sz_i") * CT_TAU)
        .select("doc_in", "doc_out")
    )
    sa = sh.select(F.col("doc_id").alias("doc_in"), "sh_hash")
    sb = sh.select(F.col("doc_id").alias("doc_out"), "sh_hash")
    inter = (
        cand.join(sa, "doc_in")
        .join(sb, ["doc_out", "sh_hash"])
        .groupBy("doc_in", "doc_out")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_in"), F.col("sz").alias("sz_in"))
    ctn = F.floor(F.col("n_inter") * 100.0 / F.col("sz_in")).cast("long")
    return (
        inter.join(za, "doc_in")
        .select("doc_in", "doc_out", "n_inter", ctn.alias("containment_c"))
        .filter(F.col("containment_c") >= CT_TAU)
        .orderBy("doc_in", "doc_out")
    )
