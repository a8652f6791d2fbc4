"""Incremental connected-components maintenance — the streaming face of
dedup clustering (operators/dedup.py::connected_components, whose batch
query dedup_cluster_cc proves the closure math against a WITH RECURSIVE
oracle; this module is how the cluster table is MAINTAINED as near-dup
pairs stream in from the incremental dedup face).

Per micro-batch of new (doc_a, doc_b) pairs, only the AFFECTED subgraph
relabels:

  1. touched labels = labels of the batch's endpoints already in state;
  2. the affected subgraph = the batch's edges UNION one (node, label)
     edge per state row in a touched component — the label node is the
     component's minimum, so these star edges are a connectivity-exact
     contraction of each old component (same components, fewer edges);
  3. pointer-jumping CC over that subgraph (the batch operator, O(log
     diameter) waves over O(batch + touched-state) rows);
  4. write relabeled + untouched-carried-forward labels as THIS EPOCH's
     full snapshot.

Step 0 (before any of that): batch edges whose two endpoints ALREADY
share a stored label are dropped — by the convergent-monotone invariant
they cannot change any label, so they are no-ops. This is what keeps a
mega-component cheap: near-dup graphs grow giant boilerplate clusters,
and without the filter one internal edge would re-run pointer-jumping
over the whole component every batch. With it, per-batch RELABELING work
is O(batch x NEWLY-MERGED component size) — only components a batch
actually extends or bridges are contracted and relabeled — independent
of the number (and the size) of stored components the batch merely
touches internally. The touched-label probe is one equi-join against the
stored label table (read like any index — partitioned by node at scale,
so the batch's endpoints hit their slices, not a full scan) — the
equivalent of dedup_stream's O(batch x collision rate) contract, one
level up the pipeline. Corpora where even the NEWLY-merged slice of a
mega-component is too hot (adversarial boilerplate floods) pass
``max_component``: edges that would relabel a component larger than the
cap are DEFERRED to a side table instead of relabeled inline (the
per-batch bound becomes O(batch x min(cap, newly-merged component))),
and :func:`flush_deferred` folds them in with one batch-CC pass at a
cadence the operator chooses — the same work the inline path would have
done, amortized off the latency-critical loop. Deferral only ever
DELAYS label convergence (min-labels are order-independent), so
streamed-after-flush == batch stays provable; labels read between a
deferral and its flush are conservative (two clusters not yet merged),
never wrong about membership already applied.

State taxonomy (fourth pattern in the catalogue after ledger, idempotent
monoid, epoch partials): CONVERGENT MONOTONE state — a component's label
is the min doc id over its members, merges only ever DECREASE labels, and
the result is independent of pair arrival order (min is commutative/
associative/idempotent), which is what makes streamed == batch provable.
Snapshots use the epoch-partition recipe: each epoch OVERWRITES
``labels/batch=<epoch_id>`` with the full (small — only docs that appear
in near-dup pairs, a thin slice of the corpus) label table; the batch body
reads the latest partition STRICTLY BELOW its own epoch, so a replay
recomputes from the same prior state and rewrites the same snapshot
(idempotent), and a half-written crash partition is invisible to the
replay that heals it. At 100 TB the snapshot-per-epoch becomes a Delta /
Iceberg MERGE of only the relabeled rows; the subgraph algebra is
unchanged.

Retention: superseded ``batch=<epoch>`` snapshots are NOT pruned
implicitly (a reader that resolved the latest epoch pre-write keeps its
files, mirroring compact_stream's generation contract). A long-running
stream must call :func:`prune_epochs` periodically — keep >= 2 so the
below-own-epoch replay read always has a committed predecessor.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.operators.dedup import connected_components


def latest_epoch(labels_dir: str, below: int | None = None) -> int | None:
    """Highest committed epoch id under ``labels_dir`` (optionally only
    epochs strictly below ``below`` — what a replaying batch body reads)."""
    if not os.path.isdir(labels_dir):
        return None
    epochs = [
        int(m.group(1))
        for d in os.listdir(labels_dir)
        if (m := re.fullmatch(r"batch=(\d+)", d))
    ]
    if below is not None:
        epochs = [e for e in epochs if e < below]
    return max(epochs, default=None)


def current_labels(
    spark: SparkSession, labels_dir: str, below: int | None = None
) -> DataFrame | None:
    """The (node, label) snapshot of the latest committed epoch, or None."""
    ep = latest_epoch(labels_dir, below)
    if ep is None:
        return None
    return spark.read.parquet(os.path.join(labels_dir, f"batch={ep}")).select(
        "node", "label"
    )


def novel_pairs(pairs: DataFrame, prior: DataFrame) -> DataFrame:
    """Batch edges that can actually change a label: at least one endpoint
    is unlabeled, or the endpoints carry DIFFERENT stored labels. Edges
    internal to an existing component are provable no-ops (labels are the
    component min and merges only decrease them — convergent monotone), so
    dropping them BEFORE the affected subgraph is built is what bounds
    relabel work by the newly-merged component, not the largest touched
    one (one internal edge into a giant boilerplate cluster relabels
    nothing)."""
    la = prior.select(F.col("node").alias("doc_a"), F.col("label").alias("_la"))
    lb = prior.select(F.col("node").alias("doc_b"), F.col("label").alias("_lb"))
    return (
        pairs.join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .filter(
            F.col("_la").isNull()
            | F.col("_lb").isNull()
            | (F.col("_la") != F.col("_lb"))
        )
        .select("doc_a", "doc_b")
    )


def split_by_component_size(
    pairs: DataFrame, prior: DataFrame, cap: int
) -> tuple[DataFrame, DataFrame]:
    """(inline_pairs, deferred_pairs): an edge is deferred when either
    endpoint's stored component holds more than ``cap`` members
    (unlabeled endpoints count as singletons, so fresh-doc edges are
    never deferred). Called AFTER novel_pairs, so only edges that would
    actually relabel are sized."""
    sizes = prior.groupBy("label").agg(F.count(F.lit(1)).alias("_n"))
    la = prior.select(F.col("node").alias("doc_a"), F.col("label").alias("_la"))
    lb = prior.select(F.col("node").alias("doc_b"), F.col("label").alias("_lb"))
    p = (
        pairs.join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .join(
            sizes.select(F.col("label").alias("_la"), F.col("_n").alias("_na")),
            "_la",
            "left",
        )
        .join(
            sizes.select(F.col("label").alias("_lb"), F.col("_n").alias("_nb")),
            "_lb",
            "left",
        )
    )
    big = (
        F.greatest(
            F.coalesce(F.col("_na"), F.lit(1)),
            F.coalesce(F.col("_nb"), F.lit(1)),
        )
        > cap
    )
    return (
        p.filter(~big).select("doc_a", "doc_b"),
        p.filter(big).select("doc_a", "doc_b"),
    )


def merge_pairs_batch(
    spark: SparkSession,
    batch_pairs: DataFrame,
    labels_dir: str,
    epoch_id: int = 0,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_component: int | None = None,
    deferred_dir: str | None = None,
) -> None:
    """One micro-batch body: relabel only the components the batch's
    pairs touch, carry every other component forward, write this epoch's
    snapshot (partition overwrite — replay-idempotent). ``a_col``/
    ``b_col`` name the pair endpoints — dedup_stream's decisions table
    uses (new_id, index_id).

    With ``max_component`` (requires ``deferred_dir``), edges that would
    relabel a component larger than the cap are written to
    ``deferred_dir/batch=<epoch>`` (overwrite — replay-idempotent)
    instead of relabeled inline; :func:`flush_deferred` folds them in
    later. Module docstring: deferral only delays min-label convergence,
    never corrupts it."""
    pairs = (
        batch_pairs.select(
            F.col(a_col).cast("long").alias("doc_a"),
            F.col(b_col).cast("long").alias("doc_b"),
        )
        .filter(F.col("doc_a").isNotNull() & F.col("doc_b").isNotNull())
        .dropDuplicates()
    )
    prior = current_labels(spark, labels_dir, below=int(epoch_id))

    if prior is None:
        labels = connected_components(pairs, "doc_a", "doc_b")
    else:
        prior = prior.localCheckpoint(eager=True)  # one read, four uses
        # no-op edges (both endpoints already co-labeled) out FIRST:
        # relabel cost is bounded by the newly-merged components only
        pairs = novel_pairs(pairs, prior)
        if max_component is not None:
            if deferred_dir is None:
                raise ValueError("max_component requires deferred_dir")
            pairs, deferred = split_by_component_size(
                pairs, prior, int(max_component)
            )
            deferred.write.mode("overwrite").parquet(
                os.path.join(deferred_dir, f"batch={int(epoch_id)}")
            )
        ends = (
            pairs.select(F.col("doc_a").alias("node"))
            .unionByName(pairs.select(F.col("doc_b").alias("node")))
            .dropDuplicates()
        )
        touched = (
            prior.join(ends, "node", "left_semi")
            .select("label")
            .dropDuplicates()
        )
        # star contraction of each touched component: node—label edges are
        # connectivity-exact (label IS a member, the component minimum)
        star = prior.join(
            F.broadcast(touched), "label", "left_semi"
        ).filter(F.col("node") != F.col("label"))
        sub_edges = pairs.unionByName(
            star.select(
                F.col("node").alias("doc_a"), F.col("label").alias("doc_b")
            )
        )
        relabeled = connected_components(sub_edges, "doc_a", "doc_b")
        untouched = prior.join(F.broadcast(touched), "label", "left_anti")
        labels = untouched.unionByName(relabeled).dropDuplicates()

    labels.select("node", "label").write.mode("overwrite").parquet(
        os.path.join(labels_dir, f"batch={int(epoch_id)}")
    )


def flush_deferred(
    spark: SparkSession,
    labels_dir: str,
    deferred_dir: str,
    epoch_id: int,
) -> int:
    """Fold every deferred edge into the label table with ONE uncapped
    relabel pass at ``epoch_id`` — a fresh epoch above every previously
    WRITTEN one, stream or flush: the batch body reads strictly below
    its own epoch, so a reused epoch would read past its own previous
    snapshot and discard it — then clear the deferral ledger.
    Crash-idempotent: a
    re-flush re-reads edges whose merges already landed, novel_pairs
    drops them as co-labeled, the snapshot rewrites identically, and
    the ledger is cleared again. Returns the number of edges folded."""
    if not os.path.isdir(deferred_dir):
        return 0
    parts = [
        os.path.join(deferred_dir, d)
        for d in os.listdir(deferred_dir)
        if re.fullmatch(r"batch=(\d+)", d)
    ]
    if not parts:
        return 0
    edges = (
        spark.read.option("basePath", deferred_dir)
        .parquet(*parts)
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    n = edges.count()
    if n:
        merge_pairs_batch(spark, edges, labels_dir, epoch_id)
    for d in parts:
        shutil.rmtree(d, ignore_errors=True)
    return n


def prune_epochs(labels_dir: str, keep: int = 2) -> list[str]:
    """Best-effort removal of superseded ``batch=<epoch>`` snapshots,
    keeping the ``keep`` highest epoch ids — the labels-dir twin of
    compact_stream.prune_generations. Called explicitly by the stream
    owner (never from inside a batch body), so in-flight readers keep
    their files; ``keep >= 2`` leaves the replay read a committed
    predecessor below any epoch that might still re-run."""
    if keep < 1 or not os.path.isdir(labels_dir):
        return []
    epochs = sorted(
        (
            int(m.group(1))
            for d in os.listdir(labels_dir)
            if (m := re.fullmatch(r"batch=(\d+)", d))
        ),
        reverse=True,
    )
    removed: list[str] = []
    for ep in epochs[keep:]:
        path = os.path.join(labels_dir, f"batch={ep}")
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def cc_sink(
    spark: SparkSession,
    labels_dir: str,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
):
    """foreachBatch callable wiring merge_pairs_batch into a pair stream
    (e.g. ``cc_sink(spark, d, "new_id", "index_id")`` over the decisions
    table dedup_stream appends)."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        merge_pairs_batch(spark, batch, labels_dir, epoch_id, a_col, b_col)

    return process
