"""Temporal fact resolution + conflict detection over the linked KG —
the fusion layer of KG construction: a web corpus asserts the same
(entity, predicate) many times across pages crawled at different times
with different values, and the KG must publish ONE current fact per
functional slot plus an inventory of what disagreed.

Reference parity: the reference KB holds one value per FAQ/KB key and
last-write-wins on rebuild (muneebakhter/DARKBO ai_worker.py KB load —
dict insertion order); this generalizes that to crawl-timestamped triple
streams, the standard "fact fusion by recency" step (cf. Dong et al.,
Knowledge Vault) re-expressed as one window/aggregate.

Scale shape (100 TB): both operators shuffle the triple stream ONCE on
the (subj_eid, pred) fact key — a fine-grained key (entities × predicates),
so no reducer sees more than one entity-slot's mentions; there is no
self-join, no product, and the window never funnels through a single
partition. Head entities are bounded by mentions-per-slot, the same skew
envelope as the link stage's salted join upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# predicates expected to hold ONE value per subject (the functional slots
# worth resolving / flagging); multi-valued predicates (acquired,
# partnered_with, launched, works_at...) are excluded by default.
FUNCTIONAL_PREDS = ("founded_in", "founded_by", "based_in", "is_a")


def resolve_facts(
    linked: DataFrame,
    as_of: str,
    ts_col: str = "warc_ts",
    functional_preds: tuple[str, ...] = FUNCTIONAL_PREDS,
) -> DataFrame:
    """Functional-slot-aware fact resolution as of a cutoff date.

    * FUNCTIONAL slots (`pred` in `functional_preds`) collapse to ONE
      value — the obj asserted by the most recent page with ts on or
      before `as_of`, ties at the winning timestamp breaking to the max
      obj (deterministic, layout-invariant).
    * MULTI-VALUED slots (acquired, launched, works_at, …) publish their
      FULL value set: one row per distinct obj asserted on or before the
      cutoff. Reference analog: the KB's dict-insertion-order
      last-write-wins applies per unique KEY — the functional case only;
      collapsing `acquired` to its latest object would silently drop
      facts.

    The cutoff is DAY-INCLUSIVE for timestamp inputs: `as_of='2024-01-05'`
    keeps a page crawled 2024-01-05 10:00 (`to_date(ts) <= as_of`, not a
    midnight-upcast `ts <= as_of`).

    Every published value carries its validity envelope: `fact_date` =
    most recent assertion date (the envelope end — the winning date for
    functional slots), `first_seen` = earliest assertion date,
    `n_mentions` = assertion count, all within the cutoff.

    Scale shape: one map-side-combinable aggregate on the fine-grained
    (subj_eid, pred, obj) fact key collapses the mention stream; the
    latest-wins window then moves only the ALREADY-COLLAPSED fact table
    (one row per distinct value), never the mentions — same envelope as
    fact_support. Returns (subj_eid, pred, obj, fact_date, first_seen,
    n_mentions)."""
    scoped = linked.filter(
        F.to_date(F.col(ts_col)) <= F.lit(as_of).cast("date")
    )
    return resolve_from_envelopes(
        fact_envelopes(scoped, ts_col), functional_preds
    )


def fact_envelopes(linked: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """MERGEABLE sufficient statistics of the fact state: one row per
    (subj_eid, pred, obj) with (first_ts, last_ts, n_mentions). This is
    the table an INCREMENTAL fact state persists — max/min/count are
    associative and commutative, so a crawl cycle's delta merges into
    the stored state with one aggregate and NO re-read of historical
    mentions (merge_fact_envelopes); winner selection is a separate,
    cheap pass over the dictionary-bounded state (resolve_from_envelopes).
    Mentions only ever ACCUMULATE (a crawl never retracts an assertion),
    which is exactly why the envelope algebra is sufficient."""
    return (
        linked.filter(F.col("subj_eid").isNotNull())
        .groupBy("subj_eid", "pred", "obj")
        .agg(
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            F.count("*").cast("bigint").alias("n_mentions"),
        )
    )


def merge_fact_envelopes(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental fact-state maintenance: fold a new crawl cycle's
    envelope delta into the stored state — one map-side-combinable
    aggregate on the fact key over the union (min/max/sum are the
    envelope algebra). Commutative and associative: any merge order
    yields the same state, so cycles can land out of order."""
    both = state.select(
        "subj_eid", "pred", "obj", "first_ts", "last_ts", "n_mentions"
    ).unionByName(
        delta.select(
            "subj_eid", "pred", "obj", "first_ts", "last_ts", "n_mentions"
        )
    )
    return both.groupBy("subj_eid", "pred", "obj").agg(
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
        F.sum("n_mentions").cast("bigint").alias("n_mentions"),
    )


def resolve_from_envelopes(
    env: DataFrame,
    functional_preds: tuple[str, ...] = FUNCTIONAL_PREDS,
) -> DataFrame:
    """Winner selection over an envelope state (fact_envelopes /
    merge_fact_envelopes output): functional slots latest-wins on
    (last_ts, obj), multi-valued slots pass through — the second phase
    of resolve_facts, shared verbatim so the incremental path can never
    drift from the oracled as-of semantics. The window moves only the
    COLLAPSED state, never mentions."""
    out = env
    if functional_preds:
        # winner = the row holding max (last_ts, obj) in its slot — an
        # UNORDERED window aggregate instead of a row_number over a fully
        # ordered window: the exec sorts only on the partition keys, never
        # on (last_ts, obj), so the big multi-valued partitions skip the
        # value sort they were paying for a rank they never used. struct
        # max compares (last_ts, obj) lexicographically — exactly the old
        # (desc, desc) rk==1 row; obj is the group key, so the max is
        # unique and exactly one row matches.
        w = Window.partitionBy("subj_eid", "pred")
        key = F.struct(F.col("last_ts"), F.col("obj"))
        out = (
            env.withColumn("_mx", F.max(key).over(w))
            .filter(
                (~F.col("pred").isin(*functional_preds)) | (key == F.col("_mx"))
            )
            .drop("_mx")
        )
    return out.select(
        "subj_eid",
        "pred",
        "obj",
        F.date_format("last_ts", "yyyy-MM-dd").alias("fact_date"),
        F.date_format("first_ts", "yyyy-MM-dd").alias("first_seen"),
        "n_mentions",
    )


def entity_types(linked: DataFrame) -> DataFrame:
    """Majority-vote type assignment: each entity's `is_a` assertions
    across the corpus are tallied and the modal type wins (ties break to
    the lexicographically smallest type, so the published type table is
    deterministic). The ontology layer of KG construction — one count
    aggregate + one window over the entity key.
    Returns (subj_eid, entity_type, n_mentions)."""
    counts = (
        linked.filter(F.col("subj_eid").isNotNull() & (F.col("pred") == "is_a"))
        .groupBy("subj_eid", F.col("obj").alias("entity_type"))
        .agg(F.count("*").cast("bigint").alias("n_mentions"))
    )
    w = Window.partitionBy("subj_eid").orderBy(
        F.col("n_mentions").desc(), F.col("entity_type").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("subj_eid", "entity_type", "n_mentions")
    )


def fact_support(linked: DataFrame) -> DataFrame:
    """Per-fact provenance strength: support = distinct pages asserting
    (subj_eid, pred, obj); confidence = that value's share of the slot's
    total page-assertions (a page asserting two values counts toward
    each value it asserts — the per-value evidence mass, not a page
    partition). One aggregate on the fact key, then one unordered window
    sum over the slot key — the window's exchange moves only the
    ALREADY-COLLAPSED fact table (one row per distinct value), never the
    mention stream. Returns (subj_eid, pred, obj, support, confidence)."""
    per_fact = (
        linked.filter(F.col("subj_eid").isNotNull())
        .groupBy("subj_eid", "pred", "obj")
        .agg(F.countDistinct("url").cast("bigint").alias("support"))
    )
    w = Window.partitionBy("subj_eid", "pred")
    return per_fact.select(
        "subj_eid",
        "pred",
        "obj",
        "support",
        F.round(
            F.col("support").cast("double") / F.sum("support").over(w).cast("double"),
            6,
        ).alias("confidence"),
    )


def fact_history(linked: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Temporal scoping: the validity envelope of every asserted (slot,
    value) — first/last crawl date it was seen and its mention count.
    The fact-history table a temporal KG serves intervals from (and the
    input recency-fusion reads its cutoffs against). One map-side-
    combinable aggregate on the (subj_eid, pred, obj) fact key.
    Returns (subj_eid, pred, obj, first_seen, last_seen, n_mentions)."""
    return (
        linked.filter(F.col("subj_eid").isNotNull())
        .groupBy("subj_eid", "pred", "obj")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd").alias("first_seen"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd").alias("last_seen"),
            F.count("*").cast("bigint").alias("n_mentions"),
        )
    )


# predicates whose OBJECT position holds an entity mention (vs literals:
# years for founded_in, type strings for is_a, place names handled by the
# city dictionary) — the object-side NIL mining universe
ENTITY_OBJ_PREDS = (
    "founded_by",
    "ceo_of",
    "works_at",
    "acquired",
    "subsidiary_of",
    "partnered_with",
    "launched",
)


def nil_candidates(
    linked: DataFrame,
    min_mentions: int = 2,
    side: str = "subj",
    obj_preds: tuple[str, ...] = ENTITY_OBJ_PREDS,
) -> DataFrame:
    """Dictionary growth (NIL mining): surfaces the link stage could NOT
    resolve, grouped by the SAME normalization the linker matches with
    (lower/trim/leading-'the ' strip — kg/link._norm), kept when they
    recur. Recurring unlinked surfaces are exactly the entities the
    dictionary is missing; the output feeds the next dictionary build.

    `side`: "subj" (default — every subject is an entity mention), "obj"
    (objects of `obj_preds` only: object slots of literal-valued
    predicates like founded_in/is_a are years and type strings, which
    must never pollute the growth worklist), or "both" (union of the two
    streams before the rollup, so a surface recurring once per position
    still clears the threshold).

    One aggregate on the normalized-surface key (map-side combined —
    frequent candidates are the cheap case).
    Returns (surface_norm, n_mentions, n_docs, example_surface)."""
    from darkbo_spark.kg.link import _norm

    def _side(surface_col: str, eid_col: str) -> DataFrame:
        out = linked.filter(F.col(eid_col).isNull())
        if surface_col == "obj":
            out = out.filter(F.col("pred").isin(*obj_preds))
        return out.select(
            _norm(F.col(surface_col)).alias("surface_norm"),
            F.col(surface_col).alias("surface"),
            "url",
        )

    if side == "subj":
        surfaces = _side("subj", "subj_eid")
    elif side == "obj":
        surfaces = _side("obj", "obj_eid")
    elif side == "both":
        surfaces = _side("subj", "subj_eid").unionByName(_side("obj", "obj_eid"))
    else:
        raise ValueError(f"side must be subj/obj/both, got {side!r}")
    return (
        surfaces.groupBy("surface_norm")
        .agg(
            F.count("*").cast("bigint").alias("n_mentions"),
            F.countDistinct("url").cast("bigint").alias("n_docs"),
            F.min("surface").alias("example_surface"),
        )
        .filter(F.col("n_mentions") >= min_mentions)
    )


def entity_profiles(linked: DataFrame) -> DataFrame:
    """The entity page a constructed KG serves: one row per entity with
    its modal type (null when never typed), distinct asserted fact count,
    and in/out degree over the fully-resolved edge set. Universe =
    entities in the edge set ∪ entities asserting any fact (a full-outer
    join of two aggregates — every join here keys on the entity id, so
    the composition adds no shape a 100 TB corpus hasn't already paid
    for in the parts). Returns (eid, entity_type, n_facts, out_deg,
    in_deg)."""
    from darkbo_spark.operators.graph import degree_centrality

    edges = linked.filter(
        F.col("subj_eid").isNotNull() & F.col("obj_eid").isNotNull()
    ).select(F.col("subj_eid").alias("src"), F.col("obj_eid").alias("dst"))
    deg = degree_centrality(edges).select(
        F.col("node").alias("eid"), "out_deg", "in_deg"
    )
    ty = entity_types(linked).select(
        F.col("subj_eid").alias("eid"), "entity_type"
    )
    # fact identity = (pred, value) joined on a non-text separator — obj
    # is free text and must not merge with pred under a printable glue
    fc = (
        linked.filter(F.col("subj_eid").isNotNull())
        .groupBy(F.col("subj_eid").alias("eid"))
        .agg(
            F.countDistinct(F.concat_ws("\x1f", "pred", "obj"))
            .cast("bigint")
            .alias("n_facts")
        )
    )
    return (
        deg.join(fc, "eid", "full_outer")
        .join(ty, "eid", "left")
        .select(
            "eid",
            "entity_type",
            F.coalesce("n_facts", F.lit(0)).cast("bigint").alias("n_facts"),
            F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"),
        )
    )


def detect_conflicts(
    linked: DataFrame, functional_preds: tuple[str, ...] = FUNCTIONAL_PREDS
) -> DataFrame:
    """Functional-dependency violations: (subj_eid, pred) slots asserting
    >1 distinct value anywhere in the corpus — the curation worklist that
    precedes resolution. One map-side-combinable aggregate; value extremes
    (not an array) summarize the disagreement cross-engine-stably.
    Returns (subj_eid, pred, n_values, n_mentions, first_obj, last_obj)."""
    return (
        linked.filter(F.col("subj_eid").isNotNull())
        .filter(F.col("pred").isin(*functional_preds))
        .groupBy("subj_eid", "pred")
        .agg(
            F.countDistinct("obj").cast("bigint").alias("n_values"),
            F.count("*").cast("bigint").alias("n_mentions"),
            F.min("obj").alias("first_obj"),
            F.max("obj").alias("last_obj"),
        )
        .filter(F.col("n_values") > 1)
    )


def fact_changes(
    linked: DataFrame,
    as_of_old: str,
    as_of_new: str,
    ts_col: str = "warc_ts",
    functional_preds: tuple[str, ...] = FUNCTIONAL_PREDS,
) -> DataFrame:
    """What changed between two as-of fact states — the crawl-cadence
    diff ("what did this week's crawl change?"): rows (subj_eid, pred,
    obj, change) where change='added' (published at `as_of_new` but not
    at `as_of_old`) or 'removed' (the reverse; a functional slot's value
    swap appears as one added + one removed row).

    ONE pass over the mention stream instead of two resolve_facts
    invocations: a single envelope aggregate on the fact key computes
    each value's max assertion timestamp at BOTH cutoffs (the old one as
    a conditional max), then two windows over the COLLAPSED fact table
    rank the functional winners per state. Output is pytest-pinned equal
    to the compositional diff of two resolve_facts states, and the
    driver oracle replays the compositional form — two independent
    formulations under one hash. Day-inclusive cutoffs like
    resolve_facts."""
    d = F.to_date(F.col(ts_col))
    env = (
        linked.filter(F.col("subj_eid").isNotNull())
        .filter(d <= F.lit(as_of_new).cast("date"))
        .groupBy("subj_eid", "pred", "obj")
        .agg(
            F.max(ts_col).alias("_ts_new"),
            F.max(
                F.when(d <= F.lit(as_of_old).cast("date"), F.col(ts_col))
            ).alias("_ts_old"),
        )
    )
    if functional_preds:
        w_new = Window.partitionBy("subj_eid", "pred").orderBy(
            F.col("_ts_new").desc(), F.col("obj").desc()
        )
        w_old = Window.partitionBy("subj_eid", "pred").orderBy(
            F.col("_ts_old").desc_nulls_last(), F.col("obj").desc()
        )
        env = env.withColumn("_rk_new", F.row_number().over(w_new)).withColumn(
            "_rk_old", F.row_number().over(w_old)
        )
        is_func = F.col("pred").isin(*functional_preds)
        in_new = (~is_func) | (F.col("_rk_new") == 1)
        in_old = F.col("_ts_old").isNotNull() & (
            (~is_func) | (F.col("_rk_old") == 1)
        )
    else:
        in_new = F.lit(True)
        in_old = F.col("_ts_old").isNotNull()
    return (
        env.withColumn(
            "change",
            F.when(in_new & ~in_old, F.lit("added")).when(
                in_old & ~in_new, F.lit("removed")
            ),
        )
        .filter(F.col("change").isNotNull())
        .select("subj_eid", "pred", "obj", "change")
    )
