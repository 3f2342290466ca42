"""Distributed connected components — cluster assignment over near-dup
pair graphs (the step after candidate generation + verification: pairs
say "these two are duplicates", components say "this is the dedup group
and this member survives").

Two algorithms, one contract (``component = min(reachable node id)``,
deterministic, engine-portable — the DuckDB oracle recomputes it with a
recursive CTE):

- **Min-label propagation** (default): every node starts labeled with
  its own id; each round pushes labels across edges, keeps the minimum
  seen, then POINTER-JUMPS (comp := label(comp)) so propagated distance
  doubles per round — O(log diameter) rounds. Near-dup graphs are
  unions of small cliques and stars (diameter ≲ 3-4 even on web-scale
  corpora — a duplicate cluster is by construction densely connected),
  and entity-linkage chains (k109) stay inside the round cap at any
  realistic chain length (2^25 hops).
- **Large-star/small-star alternation** (Kiveris et al., "Connected
  Components in MapReduce and Beyond"): each round contracts every node
  toward the minimum of its neighborhood, halving long paths — O(log²
  n) rounds on ANY graph shape. This is the escape hatch for
  adversarial long-path graphs, and what :func:`connected_components`
  falls back to (with a warning) when the propagation round cap is hit
  instead of silently returning partially-propagated labels (ADVICE
  r4).

Scale design per round (both algorithms): one equi-join + one
groupBy-min (map-side partial), shuffles keyed by node id so AQE
coalesces them, and ``localCheckpoint`` truncates the lineage each round
(an unbounded iterative plan otherwise re-executes every prior round per
action and overwhelms the optimizer).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
    _stats: dict | None = None,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component
    is the minimum node id reachable. Nodes with no edges don't appear —
    singletons are trivially their own component and the caller can
    left-join them back if wanted.

    Min-label propagation with ADAPTIVE pointer jumping (path
    compression from round 4 on), O(log diameter) rounds on deep
    graphs — a 30-hop entity chain converges in ~8 rounds, not 30 —
    at zero extra cost on the shallow graphs dedup produces (the
    common case converges before the jump engages). If ``max_iter``
    rounds still don't
    reach the fixpoint, a warning is emitted and the computation
    RESTARTS on the star algorithm (O(log² n) rounds regardless of
    shape) — the caller always gets fully-converged labels, never a
    silent partial result."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # lazy checkpoints throughout the loop (optimization round 13): the
    # signature aggregate is the action that materializes each round's
    # checkpoint (localCheckpoint persists its blocks on first
    # computation), so every round costs ONE driver action instead of
    # two (eager checkpoint job + signature job); lineage truncation is
    # unchanged.
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )

    def _label_sig(lab: DataFrame):
        # Order-independent signature of the label assignment: a
        # decimal sum of per-row (id, comp) hashes. Labels only ever
        # DECREASE (min over a growing reachable set), so the
        # assignment changes every round until the fixpoint — equal
        # signatures ⟺ converged (w.h.p.; the loop then CONFIRMS
        # exactly with a changed-row probe before declaring
        # convergence, so a hash-sum collision can only cost one
        # extra join, never a silent partial result). Type-agnostic,
        # unlike a
        # Σcomp probe, so STRING node ids (KQL graphs over event
        # types, user names) work; one O(n) scan of the checkpointed
        # labels, no join-and-compare.
        return lab.agg(
            F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)"))
        ).first()[0]

    prev_sum = _label_sig(labels)
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        msgs = sym.join(labels, sym["a"] == labels["id"]).select(
            F.col("b").alias("id"), "comp"
        )
        stepped = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # Pointer jump (path compression): comp := min(comp,
        # label(comp)). Every comp value IS a node id, so one self-join
        # hop roughly DOUBLES the propagated distance per round —
        # convergence in O(log diameter) rounds instead of O(diameter),
        # which is what makes long chains (per-entity event chains,
        # linked-record paths) converge inside the round cap instead of
        # restarting on the star algorithm. ADAPTIVE: the jump join is
        # skipped for the first 3 rounds, so the shallow clique/star
        # graphs dedup produces (diameter ≲ 3-4 — the common case)
        # never pay for it; anything still unconverged after 3 plain
        # rounds is a deep graph where the jump wins by orders.
        if rounds > 3:
            lk = stepped.select(
                F.col("id").alias("__cid"), F.col("comp").alias("__ccomp")
            )
            stepped = stepped.join(
                lk, stepped["comp"] == lk["__cid"], "left"
            ).select("id", F.least("comp", "__ccomp").alias("comp"))
        new_labels = stepped.localCheckpoint(eager=False)
        new_sum = _label_sig(new_labels)
        if new_sum == prev_sum:
            # Signature equality is necessary but only w.h.p.
            # sufficient (hash-sum collision). One EXACT changed-row
            # probe on the candidate final round makes early exit
            # collision-proof: both sides are checkpointed, the join
            # is equi-keyed on id, and limit(1) short-circuits at the
            # first difference — paid once, never per round.
            changed = (
                new_labels.alias("n")
                .join(labels.alias("p"), "id")
                .filter(F.col("n.comp") != F.col("p.comp"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = new_labels
                converged = True
                break
        labels = new_labels
        prev_sum = new_sum
    sym.unpersist()
    if _stats is not None:
        _stats["rounds"] = rounds
        _stats["converged"] = converged
    if not converged:
        warnings.warn(
            f"connected_components: min-label propagation did not reach "
            f"its fixpoint in max_iter={max_iter} rounds (graph diameter "
            f"> {max_iter}; dedup graphs never look like this) — falling "
            f"back to large-star/small-star, O(log² n) rounds on any "
            f"shape",
            RuntimeWarning,
            stacklevel=2,
        )
        return connected_components_star(edges, src=src, dst=dst)
    return labels


def _edge_signature(e: DataFrame) -> tuple:
    """Order-insensitive fingerprint of an edge set, used as the star
    fixpoint test (one aggregate scan, no join-and-compare)."""
    row = e.agg(
        F.count("*").alias("n"),
        # per-endpoint hash sums, not raw casts, so STRING node ids
        # work; decimal sum because a long sum of 64-bit hashes
        # overflows under ANSI
        F.sum(F.xxhash64("a").cast("decimal(38,0)")).alias("sa"),
        F.sum(F.xxhash64("b").cast("decimal(38,0)")).alias("sb"),
        F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["sa"], row["sb"], row["h"])


def connected_components_star(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 60,
    _stats: dict | None = None,
) -> DataFrame:
    """(id, component) via alternating large-star/small-star — the
    shape-robust form: O(log² n) rounds on ANY graph, including long
    paths, at the same per-round cost as label propagation (one
    groupBy-min + one equi-join).

    One round:
    - **large-star**: for every node u, connect each STRICTLY LARGER
      neighbor to m(u) = min(N(u) ∪ {u}).
    - **small-star**: for every node u, connect each neighbor ≤ u (and
      u itself) to the minimum of that set.
    Both steps only ever link nodes to smaller ids, so the edge set
    monotonically contracts toward per-component stars rooted at the
    component minimum; the fixpoint is exactly those stars. Each round
    rewrites the edge set (localCheckpoint truncates lineage) and
    convergence is an aggregate-scan signature, not a join.

    ``max_iter`` is a safety net only — 60 rounds covers any graph that
    fits in storage (log²(2⁶⁴) < 60 large/small pairs); hitting it
    raises instead of returning partial labels."""
    # lazy checkpoints (optimization round 13, same as
    # connected_components): each round's edge-signature aggregate is
    # the one action that materializes that round's checkpoints
    # (``large`` is computed once and served from its checkpoint blocks
    # to both of ``small``'s references), so a round costs ONE driver
    # action instead of three.
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sig = _edge_signature(e)
    rounds = 0
    for _ in range(max_iter):
        # ---- large-star: sym view, emit (bigger-neighbor -> m(u)) ----
        sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        mins = mins.select("a", F.least("a", "mn").alias("m"))
        large = (
            sym.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("x"), F.col("m").alias("y"))
            .filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        # ---- small-star: group by the LARGER endpoint ----
        # canonical (a < b) means b's smaller-or-equal neighbors are
        # exactly the a values grouped by b
        smins = large.groupBy("b").agg(F.min("a").alias("mn"))
        small = (
            large.join(smins, "b")
            .select(F.col("a").alias("x"), F.col("mn").alias("y"))
            .unionByName(
                smins.select(F.col("b").alias("x"), F.col("mn").alias("y"))
            )
            .filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        rounds += 1
        new_sig = _edge_signature(small)
        if new_sig == sig:
            # Exact confirmation of the w.h.p. signature match: both
            # edge sets are distinct'd, so equal cardinality (checked
            # by the signature's count field) plus small ⊆ e proves
            # set equality — one anti-join probe, only on the
            # candidate final round.
            extra = (
                small.join(e, ["a", "b"], "left_anti").limit(1).count()
            )
            if extra == 0:
                e = small
                break
        e = small
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint in {max_iter} rounds "
            f"— not a connectivity structure this algorithm can miss; "
            f"inspect the edge input for pathological id types"
        )
    if _stats is not None:
        _stats["rounds"] = rounds
    # fixpoint edges are (member -> root) with root = component min,
    # canonically stored as (a=root, b=member); roots self-map
    members = e.select(F.col("b").alias("id"), F.col("a").alias("comp"))
    roots = e.select(F.col("a").alias("id"), F.col("a").alias("comp")).distinct()
    return members.unionByName(roots).groupBy("id").agg(
        F.min("comp").alias("comp")
    )


def motif_find(
    edges: DataFrame,
    pattern: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """GraphFrames-style motif finding over a directed edge table.

    ``pattern`` is a ``;``-separated list of edge terms in the
    GraphFrames surface syntax, e.g.::

        (a)-[]->(b); (b)-[e]->(c); !(a)-[]->(c)

    Positive terms compile to a chain of hash equi-joins on the shared
    vertex variables (each term must share at least one variable with
    the already-bound set — a disconnected term would be a cross
    join, which is an error, not a silent blow-up). Negated terms
    (``!``) compile to LEFT ANTI joins on their two already-bound
    variables — both endpoints of a negation must be bound by positive
    terms, exactly GraphFrames' rule. Output columns are the vertex
    variables, plus one STRUCT column per NAMED edge variable
    (GraphFrames' ``e`` column shape) carrying every edge-table column
    other than the two endpoints — edge properties ride the same
    equi-join, so a named edge costs nothing beyond the wider shuffle
    rows. Naming an edge requires the edge table to HAVE property
    columns, and negated terms cannot be named (an anti-join binds no
    edge row).

    Scale shape: a motif with k positive terms is k-1 equi-joins on
    vertex keys plus one anti-join per negation — all shuffle-hash/
    broadcast joinable, no cross join anywhere. Intermediate fan-out is
    the wedge count of the partial motif; as with d55, the 100 TB
    mitigation for hub skew is degree-oriented edges, applied to the
    edge table BEFORE calling this (the motif algebra is unchanged).

    No vertex-distinctness is implied (also the GraphFrames contract):
    add ``WHERE a != c``-style filters on the result when the motif
    semantics need them.
    """
    import re as _re

    terms = [t.strip() for t in pattern.split(";") if t.strip()]
    pos: list[tuple[str, str, str]] = []
    neg: list[tuple[str, str]] = []
    for t in terms:
        m = _re.fullmatch(
            r"(!?)\s*\(\s*(\w+)\s*\)-\[\s*(\w*)\s*\]->\(\s*(\w+)\s*\)", t
        )
        if not m:
            raise ValueError(f"motif_find: unparsable term {t!r}")
        if m.group(1):
            if m.group(3):
                raise ValueError(
                    f"motif_find: negated term {t!r} cannot name its "
                    "edge — an anti-join binds no edge row"
                )
            neg.append((m.group(2), m.group(4)))
        else:
            pos.append((m.group(2), m.group(3), m.group(4)))
    if not pos:
        raise ValueError("motif_find: need at least one positive term")

    prop_cols = [c for c in edges.columns if c not in (src, dst)]
    enames = [e for _, e, _ in pos if e]
    if len(set(enames)) != len(enames):
        raise ValueError("motif_find: edge variable names must be unique")
    clash = set(enames) & {v for a, _, b in pos for v in (a, b)}
    if clash:
        raise ValueError(
            f"motif_find: edge variable(s) {sorted(clash)} collide with "
            "vertex variables"
        )
    if enames and not prop_cols:
        raise ValueError(
            "motif_find: named edge variables need property columns on "
            f"the edge table beyond ({src}, {dst})"
        )

    def term_df(a: str, ename: str, b: str) -> DataFrame:
        cols = [F.col(src).alias(a), F.col(dst).alias(b)]
        if ename:
            cols.append(F.struct(*prop_cols).alias(ename))
        return edges.select(*cols)

    df: DataFrame | None = None
    bound: set[str] = set()
    for a, ename, b in pos:
        e = term_df(a, ename, b)
        if df is None:
            df, bound = e, {a, b}
            continue
        on = [v for v in (a, b) if v in bound]
        if not on:
            raise ValueError(
                f"motif_find: term ({a})->({b}) shares no variable with "
                f"the bound set {sorted(bound)} — disconnected motifs "
                "(cross joins) are not supported"
            )
        if a == b:
            raise ValueError(f"motif_find: self-loop term ({a})->({b})")
        df = df.join(e, on=on)
        bound |= {a, b}
    for a, b in neg:
        missing = [v for v in (a, b) if v not in bound]
        if missing:
            raise ValueError(
                f"motif_find: negated term !({a})->({b}) uses unbound "
                f"variable(s) {missing} — negations may only constrain "
                "vertices bound by positive terms"
            )
        e = edges.select(F.col(src).alias(a), F.col(dst).alias(b))
        df = df.join(e, on=[a, b], how="left_anti")
    return df.select(*sorted(bound), *enames)
