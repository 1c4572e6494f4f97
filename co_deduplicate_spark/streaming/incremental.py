"""Incremental (session-scoped) cluster maintenance — the reference's
merge/evict semantics as a batch delta job.

Reference behavior being reproduced (SURVEY.md §2.4 G2/G4):
  * every edge carries (rules, session); edges from a *different* session
    with an empty rules list contribute their endpoints as isolated nodes
    but NOT connectivity (/root/reference/helpers/deduplicates/helpers.js:51-82);
  * after re-matching, members no longer reachable from any current-session
    evidence are evicted from the cluster (helpers.js:90-96; painless
    updateDuplicatesGraph.painless:191-196);
  * surviving members get the recomputed chain/sources/flags
    (painless 216-222).

Batch formulation: the new session contributes fresh verified edges among
(new ∪ neighboring old) docs; old edges are kept as connectivity only if
they carry rules. CC re-runs *scoped to affected components* — untouched
components keep their labels, which is what makes the delta job
O(new + affected), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..operators.connected_components import attach_singletons, connected_components
from ..operators.jaccard import verify_candidates
from ..operators.lsh import band_table, candidate_pairs
from ..operators.minhash import with_minhash


def session_edges(edges: DataFrame, current_session: str) -> DataFrame:
    """Apply the reference's edge-evidence filter: an edge is connectivity
    iff it has rules, or is stamped with the current session
    (helpers.js:51-62: same-session edges with rules connect; other-session
    rule-less edges degrade to 'node only')."""
    return edges.filter(
        (F.size(F.col("rules")) > 0) | (F.col("session") == current_session)
    )


def incremental_update(
    old_corpus: DataFrame,
    old_edges: DataFrame,
    old_labels: DataFrame,
    new_pages: DataFrame,
    cfg: DedupConfig,
    current_session: str,
    old_signatures: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Merge a new crawl session into existing clusters.

    Inputs: old corpus (url, text, ...), old edges (src, dst, rules,
    session), old labels (node, component), new pages (url, text, ...).
    ``old_signatures``: the previous session's persisted signature table
    (``(doc, minhash, n_shingles)`` as written by the pipeline's
    ``signatures`` stage) — when given, the MinHash kernel runs ONLY over
    the delta (new/re-crawled urls); every other url reuses its stored
    signature. This removes the one O(corpus) step from the delta job:
    at 10^12 docs a session costs O(new + affected), matching the
    reference's per-record incrementality (/root/reference/index.js:9-24 —
    one doTheJob per arriving doc; documentsManager.js:199-204 re-reads
    only affected docs). The caller persists ``out["signatures"]`` (e.g.
    via StageCatalog) to feed the next session. With ``None`` the full
    corpus is re-signed (the self-contained fallback).

    Returns updated edges, labels, and the full signature table for the
    next session (plus the affected-component set for audit).
    Deterministic — re-running is idempotent, and the delta path produces
    bit-identical signatures to a full recompute (same kernel, same
    config; stale-generation reuse is excluded by the kernel version tag
    in DedupConfig.config_hash when signatures ride a StageCatalog).
    """
    spark = new_pages.sparkSession
    # newest-wins on url collision (the reference's update-by-id semantics:
    # a re-crawl replaces the stored doc) — the old row is anti-joined away
    # BEFORE the union, so the surviving row is deterministic, not
    # whichever partition dropDuplicates happened to keep
    # within-batch url collisions also resolve deterministically (max text)
    new_urls_only = new_pages.select("url", "text").groupBy("url").agg(
        F.max("text").alias("text")
    )
    full_corpus = (
        old_corpus.select("url", "text")
        .join(new_urls_only.select("url"), "url", "left_anti")
        .unionByName(new_urls_only)
    )

    # 1. signatures: delta-only when the previous session's table is
    #    supplied — stored signatures for surviving old urls are reused
    #    verbatim; the kernel touches only new/re-crawled urls (newest-wins
    #    replacements are dropped from the stored table first, so a
    #    re-crawl always re-signs). Full recompute otherwise.
    if old_signatures is not None:
        kept_sigs = old_signatures.select("doc", "minhash", "n_shingles").join(
            new_urls_only.select(F.col("url").alias("doc")), "doc", "left_anti"
        )
        delta = full_corpus.join(
            kept_sigs.select(F.col("doc").alias("url")), "url", "left_anti"
        )
        sigs = kept_sigs.unionByName(
            with_minhash(delta, cfg, id_col="url", text_col="text")
        )
    else:
        sigs = with_minhash(full_corpus, cfg, id_col="url", text_col="text")
    bands = band_table(sigs, cfg)

    # 2. candidates restricted to pairs touching a new doc (delta blocking)
    new_urls = new_pages.select(F.col("url").alias("doc")).distinct()
    new_bands = bands.join(new_urls, "doc", "left_semi")
    a = new_bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc") != F.col("b.doc"))
        .select(
            F.least("a.doc", "b.doc").alias("src"),
            F.greatest("a.doc", "b.doc").alias("dst"),
        )
        .distinct()
    )
    verified = verify_candidates(
        cands, full_corpus, id_col="url", text_col="text",
        threshold=cfg.jaccard_threshold, shingle_k=cfg.shingle_k,
    )
    new_edges = verified.select(
        "src", "dst",
        F.array(F.lit(f"minhash-lsh:k{cfg.shingle_k}")).alias("rules"),
        F.lit(current_session).alias("session"),
    )

    all_edges = old_edges.select("src", "dst", "rules", "session").unionByName(new_edges)
    # A1 distinct-by-pair, rules unioned (documentsManager.js:263-298)
    all_edges = (
        all_edges.groupBy("src", "dst")
        .agg(
            F.array_distinct(F.flatten(F.collect_list("rules"))).alias("rules"),
            F.max("session").alias("session"),
        )
    )

    # 3. affected components: any component touching an endpoint of a new edge
    touched = (
        new_edges.select(F.col("src").alias("node"))
        .union(new_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    affected = (
        old_labels.join(touched, "node", "left_semi")
        .select("component")
        .distinct()
    )
    affected_nodes = old_labels.join(affected, "component", "left_semi").select("node")
    # every new url is in scope even if it produced no edges (new singletons
    # must get a label — the 'node only' path, helpers.js:51-62)
    scope_nodes = (
        affected_nodes.union(touched).union(new_urls.withColumnRenamed("doc", "node"))
        .distinct()
        .localCheckpoint()
    )

    # 4. CC over the scoped subgraph with session-evidence edge filter (G2)
    live = session_edges(all_edges, current_session)
    scoped_edges = (
        live.join(scope_nodes.withColumnRenamed("node", "src"), "src", "left_semi")
        .unionByName(
            live.join(scope_nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
        )
        .select("src", "dst")
        .distinct()
    )
    relabeled = attach_singletons(
        connected_components(scoped_edges, cfg=cfg), scope_nodes, node_col="node"
    )

    # 5. untouched components keep their labels (the O(affected) property).
    # Precedence is DETERMINISTIC: a node present on both sides (only
    # possible if the supplied old labels were internally inconsistent —
    # e.g. one node under two components, one affected and one not) takes
    # its RELABELED value via the anti-join; a dropDuplicates here would
    # keep whichever partition's row arrived first.
    untouched = old_labels.join(affected, "component", "left_anti")
    labels = untouched.join(relabeled, "node", "left_anti").unionByName(relabeled)
    return {"edges": all_edges, "labels": labels, "affected_components": affected,
            "signatures": sigs}


def run_incremental_session(
    spark,
    workdir: str,
    new_pages: DataFrame,
    cfg: DedupConfig,
    session_name: str,
) -> dict[str, DataFrame]:
    """Stateful session driver: persist corpus/edges/labels/signatures
    across crawl sessions through a StageCatalog so each arriving session
    is a pure delta job — the batch realization of the reference's
    "state lives in the index between doTheJob calls" design
    (/root/reference/index.js:9-24; state re-read per record at
    documentsManager.js:199-204).

    Layout: ``<workdir>/<table>__<session_name>`` stage tables plus a
    ``_CURRENT.json`` pointer (written via temp + atomic rename, updated
    LAST) naming the latest complete session. A crash mid-session leaves
    the pointer on the previous session — re-running the same session is
    idempotent (its stage tables are simply overwritten, the pointer flip
    is the commit point). The config hash stamped on every table includes
    the signature-kernel generation, so a resume after a kernel upgrade
    recomputes rather than reusing stale signatures.

    The first session (no pointer) bootstraps: every page is "new" against
    empty ancestors, which degenerates incremental_update into a full
    build. Every later session calls it with ``old_signatures`` from the
    stored table, so the MinHash kernel touches only the delta; the
    per-session lineage line records ``sig_delta_rows`` (kernel
    invocations) vs ``corpus_rows`` so the O(new + affected) property is
    observable per session, not just claimed.
    """
    import json as _json
    from pathlib import Path

    from ..sources.catalog import StageCatalog

    cat = StageCatalog(spark, workdir, f"{cfg.config_hash()}-incr")
    pointer = Path(workdir) / "_CURRENT.json"

    def _empty(schema: str) -> DataFrame:
        return spark.createDataFrame([], schema)

    if pointer.exists():
        prev = _json.loads(pointer.read_text())["session"]
        old_corpus = cat.read(f"corpus__{prev}")
        old_edges = cat.read(f"edges__{prev}")
        old_labels = cat.read(f"labels__{prev}")
        old_sigs = cat.read(f"signatures__{prev}")
    else:
        prev = None
        old_corpus = _empty("url string, text string")
        old_edges = _empty(
            "src string, dst string, rules array<string>, session string")
        old_labels = _empty("node string, component string")
        old_sigs = None  # bootstrap: sign everything once

    out = incremental_update(
        old_corpus, old_edges, old_labels, new_pages.select("url", "text"),
        cfg, current_session=session_name, old_signatures=old_sigs,
    )
    new_urls = new_pages.select("url").distinct()
    merged_corpus = (
        old_corpus.select("url", "text")
        .join(new_urls, "url", "left_anti")
        .unionByName(
            new_pages.select("url", "text").groupBy("url")
            .agg(F.max("text").alias("text"))
        )
    )
    corpus = cat.write(f"corpus__{session_name}", merged_corpus)
    edges = cat.write(f"edges__{session_name}", out["edges"])
    labels = cat.write(f"labels__{session_name}", out["labels"])
    sigs = cat.write(f"signatures__{session_name}", out["signatures"])
    n_new = new_urls.count()
    cat.log_lineage(f"session__{session_name}", {
        "session": session_name,
        "previous": prev,
        "corpus_rows": cat.manifest(f"corpus__{session_name}")["rows"],
        # kernel invocations this session == delta size (bootstrap: all)
        "sig_delta_rows": n_new if old_sigs is not None
        else cat.manifest(f"signatures__{session_name}")["rows"],
        "edges_rows": cat.manifest(f"edges__{session_name}")["rows"],
    })
    tmp = pointer.with_suffix(".tmp")
    tmp.write_text(_json.dumps({"session": session_name}))
    tmp.rename(pointer)  # commit point: atomic on POSIX
    return {"corpus": corpus, "edges": edges, "labels": labels,
            "signatures": sigs, "affected_components": out["affected_components"]}
