"""Incremental snapshot updates: reprocess ONLY changed pages when a new
crawl snapshot lands, and merge the corpus-level aggregates.

At 10^12 documents a full KG rebuild per crawl snapshot is not an option —
Common-Crawl-style corpora change a few percent of urls per snapshot, and
the doc-local stages (extract -> mentions -> link -> triples) are
embarrassingly parallel per document, so the correct operating mode is:

1. **Digest diff.** One narrow pass computes ``xxhash64(html)`` per url;
   a doc-keyed left join against the previous snapshot's manifest
   ``(url, digest, snap)`` classifies every page as unchanged (skip),
   changed (reprocess + subtract its old contributions) or new
   (reprocess). The per-row invariant the whole pipeline is built on —
   byte-identical extraction per url (BASELINE.json input_hint) — is what
   makes the digest a sound skip condition: same bytes ==> same text ==>
   same mentions/links/triples.
2. **Doc-local stages run on the changed subset only** and append under
   ``<table>/snap=K`` partitions — the same fused Arrow pass, broadcast
   linker and windowed triple extractor the full pipeline uses
   (``kg.pipeline.build_kg_pipeline``), so a snapshot-0 ``update()`` is
   row-identical to the batch pipeline (pinned by tests).
3. **Aggregates merge, never rebuild.** nodes/edges derive from two
   cumulative count tables — ``linked_stats(surface, label, n)`` and
   ``triple_stats(subj, pred, obj, n)``, both bounded by the gazetteer /
   predicate vocabulary, not the corpus — updated as
   ``old + counts(new rows) - counts(replaced urls' old rows)``. The
   subtraction reads the replaced urls' previous rows from their
   ``snap=<old>`` partitions via a (url, snap) join, touching candidates
   only. Alias canonicalization reruns over the (tiny, gazetteer-bounded)
   surviving surface set each snapshot.
4. **Commit = one pointer write.** Every versioned artifact for snapshot
   K (manifest, stats, aliases, nodes, edges) is written first;
   ``_CURRENT`` is written last. A crash mid-update leaves orphan
   ``v{K}`` / ``snap=K`` files that the retry overwrites — readers never
   see a half-committed snapshot. (With an Iceberg catalog the same
   design maps onto MERGE + snapshot commits; this parquet layout keeps
   the identical semantics runnable without a catalog jar.)

Current-view reads (``current_mentions()`` / ``current_triples()``) join
the per-snapshot partitions with the manifest on ``(url, snap)`` — a
doc-keyed equi-join on the partition column, eligible for dynamic
partition pruning; ``compact()`` folds history back into a single
snapshot when the join tax outgrows the rewrite cost.

Beyond the reference surface (quickner rebuilds its document store per
run — pyquickner.rs has no incremental path); the operating mode is the
standard crawl-pipeline design (per-snapshot deltas + mergeable
aggregates).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from quickner_spark.kg.canonicalize import canonicalize_aliases
from quickner_spark.kg.extract import extract_annotate_stage
from quickner_spark.kg.link import alias_table_from_gazetteer, link_mentions
from quickner_spark.kg.pipeline import _read_text, _write_text
from quickner_spark.kg.triples import window_triples
from quickner_spark.operators.annotate import normalize_gazetteer

__all__ = ["SnapshotKg", "snapshot_delta"]

_CURRENT = "_CURRENT"


def snapshot_delta(new_digests: DataFrame, old_manifest: DataFrame,
                   key_col: str = "url",
                   digest_col: str = "digest") -> DataFrame:
    """Classify a new snapshot against the previous manifest:
    ``(key, digest)`` x ``(key, digest[, snap])`` ->
    ``(key, digest, status, old_snap)`` with ``status`` in
    ``('new', 'changed')`` — unchanged keys are dropped (they are the
    skip set). One doc-keyed left join; ``old_snap`` (null for new keys)
    is the snapshot partition whose rows the update must subtract from
    the cumulative aggregates. The digest-as-skip-condition is sound
    because every doc-local stage is a pure function of the page bytes
    (byte-identical extraction per url — BASELINE.json input_hint).

    NULL digests (a page whose content column was NULL — failed fetch,
    empty capture) are excluded on BOTH sides: ``__od IS NULL`` is the
    key-absence test, so a NULL digest in the manifest would otherwise
    read as "absent" and the page would reclassify 'new' — and reprocess
    — on EVERY snapshot. Undigestable pages are treated as not part of
    either snapshot (the NULL-text policy shared with the sketch
    operators)."""
    om_cols = [F.col(key_col), F.col(digest_col).alias("__od")]
    has_snap = "snap" in old_manifest.columns
    if has_snap:
        om_cols.append(F.col("snap").alias("__os"))
    om = (old_manifest.where(F.col(digest_col).isNotNull())
          .select(*om_cols))
    joined = (new_digests.where(F.col(digest_col).isNotNull())
              .select(key_col, digest_col).join(om, key_col, "left"))
    return (joined
            .where(F.col("__od").isNull()
                   | (F.col("__od") != F.col(digest_col)))
            .select(key_col, digest_col,
                    F.when(F.col("__od").isNull(), F.lit("new"))
                    .otherwise(F.lit("changed")).alias("status"),
                    (F.col("__os") if has_snap
                     else F.lit(None).cast("int")).alias("old_snap")))


class SnapshotKg:
    """A KG maintained across crawl snapshots under ``base_dir``.

    ``update(pages)`` ingests one snapshot (any DataFrame with the pages
    schema ``url, warc_ts?, html, ...``); urls absent from a snapshot
    keep their previous content (a crawl that didn't revisit a page is
    not a deletion). Revisits WITHIN a snapshot are resolved to the
    latest capture first when a ``warc_ts`` column is present
    (:func:`operators.events.latest_by_key` arg-max — the same operator
    WARC ingest uses).

    Single-writer contract: one ``update``/``compact`` at a time per
    ``base_dir`` (crawl snapshots are inherently sequential). A crashed
    writer is safe — the ``_CURRENT`` pointer is written last, so a
    retry overwrites the orphan ``v{K}``/``snap=K`` files; two LIVE
    writers racing the same snapshot number are not coordinated (use an
    external scheduler lock, or Iceberg catalog mode where commits are
    atomic)."""

    def __init__(self, spark: SparkSession, base_dir: str,
                 gazetteer, predicates=(), extractor=None,
                 case_sensitive: bool = False):
        self.spark = spark
        self.base = base_dir.rstrip("/")
        self.gaz = normalize_gazetteer(gazetteer,
                                       case_sensitive=case_sensitive)
        self.predicates = tuple(predicates)
        self.pred_window = (max(len(p) for p in self.predicates) + 2
                            if self.predicates else 0)
        self.extractor = extractor

    # -- layout -----------------------------------------------------------
    def snap(self):
        """Current committed snapshot number, or None before ``init``."""
        cur = _read_text(self.spark, f"{self.base}/{_CURRENT}")
        return None if cur is None else json.loads(cur)["snap"]

    def _v(self, name: str, k: int) -> str:
        return f"{self.base}/{name}/v{k}"

    def _part(self, name: str, k: int) -> str:
        return f"{self.base}/{name}/snap={k}"

    def _cur(self, name: str, snap: int | None = None) -> DataFrame:
        k = self.snap()
        if k is None:
            raise ValueError(f"no committed snapshot under {self.base}")
        if snap is not None:
            if not 0 <= int(snap) <= k:
                raise ValueError(
                    f"snapshot {snap} outside committed range 0..{k}")
            k = int(snap)
            from quickner_spark.kg.pipeline import _hadoop_path
            fs, path = _hadoop_path(self.spark, self._v(name, k))
            if not fs.exists(path):
                raise ValueError(
                    f"snapshot {k} of {name!r} is gone — history folded "
                    f"by compact(); only the current snapshot remains")
        return self.spark.read.parquet(self._v(name, k))

    # -- update -----------------------------------------------------------
    def update(self, pages: DataFrame) -> dict:
        """Ingest one snapshot; returns
        ``{"snap", "pages_in", "changed", "committed"}``. ``changed`` is
        the number of pages the doc-local stages actually processed —
        the incrementality contract the tests assert on."""
        spark = self.spark
        prev = self.snap()
        k = 0 if prev is None else prev + 1

        if "warc_ts" in pages.columns:
            from quickner_spark.operators.events import latest_by_key
            pages = latest_by_key(pages, "url", "warc_ts")

        # 1. digest pass — the ONLY scan of unchanged pages' html; persist
        # (url, digest) so the classification joins below are narrow
        # parquet scans, not repeated hashes of the html column.
        (pages.select("url", F.xxhash64("html").alias("digest"))
         .write.mode("overwrite").parquet(self._part("digests", k)))
        nd = spark.read.parquet(self._part("digests", k))

        if prev is None:
            changed = nd
            replaced = None
            old_manifest = None
        else:
            old_manifest = spark.read.parquet(self._v("manifest", prev))
            delta = snapshot_delta(nd, old_manifest)
            changed = delta.select("url", "digest")
            # urls whose OLD rows must be subtracted from the aggregates
            replaced = (delta.where(F.col("status") == "changed")
                        .select("url", F.col("old_snap").alias("snap")))
        t0 = time.time()
        n_in = nd.count()
        n_changed = changed.count()
        if n_changed == 0 and prev is not None:
            self._log_update(k, n_in, 0, committed=False,
                             wall_ms=int((time.time() - t0) * 1000))
            return {"snap": prev, "pages_in": n_in, "changed": 0,
                    "committed": False}

        # 2. doc-local stages over the changed subset only (the second and
        # last scan of any html bytes, and only the changed ones)
        proc = pages.join(changed.select("url"), "url", "left_semi")
        ext = extract_annotate_stage(proc, self.gaz,
                                     window=self.pred_window,
                                     extractor=self.extractor)
        ext.write.mode("overwrite").parquet(self._part("extract", k))
        ext = spark.read.parquet(self._part("extract", k))

        cols = ["url", F.col("m.start").alias("start"),
                F.col("m.end").alias("end"),
                F.col("m.label").alias("label"),
                F.col("m.surface").alias("surface"),
                F.col("m.maximal").alias("maximal")]
        if self.pred_window:
            cols.append(F.col("m.nxt").alias("nxt"))
        (ext.select("url", F.explode("spans").alias("m")).select(*cols)
         .write.mode("overwrite").parquet(self._part("mentions", k)))
        mentions = spark.read.parquet(self._part("mentions", k))

        alias_table = alias_table_from_gazetteer(spark, self.gaz)
        linked = link_mentions(mentions, ext.select("url", "text"),
                               alias_table, id_col="url")
        linked.write.mode("overwrite").parquet(self._part("linked", k))
        linked = spark.read.parquet(self._part("linked", k))

        maximal = mentions.where(F.col("maximal")).drop("maximal")
        triples = window_triples(maximal, self.predicates, id_col="url")
        triples.write.mode("overwrite").parquet(self._part("triples", k))
        triples = spark.read.parquet(self._part("triples", k))

        # 3. merge the cumulative aggregate-grain count tables
        plus_l = linked.groupBy("surface", "label").agg(
            F.count("*").alias("n"))
        plus_t = triples.groupBy("subj", "pred", "obj").agg(
            F.count("*").alias("n"))
        if prev is not None:
            pruning = self._replaced_pruning(replaced, replaced.count())
            lstats = self._merge(self._cur_stats("linked_stats", prev),
                                 plus_l, self._minus("linked", replaced,
                                                     ["surface", "label"],
                                                     pruning),
                                 ["surface", "label"])
            tstats = self._merge(self._cur_stats("triple_stats", prev),
                                 plus_t, self._minus("triples", replaced,
                                                     ["subj", "pred", "obj"],
                                                     pruning),
                                 ["subj", "pred", "obj"])
        else:
            lstats, tstats = plus_l, plus_t
        lstats.write.mode("overwrite").parquet(self._v("linked_stats", k))
        tstats.write.mode("overwrite").parquet(self._v("triple_stats", k))
        lstats = spark.read.parquet(self._v("linked_stats", k))
        tstats = spark.read.parquet(self._v("triple_stats", k))

        # 4. canonicalization + derived nodes/edges — gazetteer-bounded
        # inputs, same derivation as the batch pipeline's s_nodes/s_edges.
        # The alias SET usually survives a snapshot unchanged (counts move,
        # surfaces rarely appear/disappear) — detect that with two
        # exceptAll counts on the gazetteer-bounded surface sets and skip
        # the similarity-join + connected-components rerun entirely: the
        # canonical map is a pure function of the alias set.
        surfaces = lstats.select(F.col("surface").alias("alias")).distinct()
        aliases_reused = False
        if prev is not None:
            prev_amap = spark.read.parquet(self._v("aliases", prev))
            prev_surf = prev_amap.select("alias")
            if (surfaces.exceptAll(prev_surf).isEmpty()
                    and prev_surf.exceptAll(surfaces).isEmpty()):
                aliases = prev_amap
                aliases_reused = True
        if not aliases_reused:
            aliases = canonicalize_aliases(surfaces)
        aliases.write.mode("overwrite").parquet(self._v("aliases", k))
        amap = spark.read.parquet(self._v("aliases", k))

        nodes = (lstats.join(amap, lstats["surface"] == amap["alias"])
                 .groupBy("canonical_id")
                 .agg(F.min("label").alias("label"),
                      F.sort_array(F.collect_set("surface")).alias("aliases"),
                      F.sum("n").alias("n_mentions")))
        nodes.write.mode("overwrite").parquet(self._v("nodes", k))
        subj_map = amap.selectExpr("alias as subj", "canonical_id as src")
        obj_map = amap.selectExpr("alias as obj", "canonical_id as dst")
        edges = (tstats.join(F.broadcast(subj_map), "subj")
                 .join(F.broadcast(obj_map), "obj")
                 .groupBy("src", "dst", "pred")
                 .agg(F.sum("n").alias("weight")))
        edges.write.mode("overwrite").parquet(self._v("edges", k))

        # 5. new manifest: unchanged urls keep their (digest, snap) row
        if prev is None:
            manifest = changed.withColumn("snap", F.lit(k))
        else:
            manifest = (old_manifest
                        .join(changed.select("url"), "url", "left_anti")
                        .unionByName(changed.withColumn("snap", F.lit(k))))
        manifest.write.mode("overwrite").parquet(self._v("manifest", k))

        # 6. commit
        self._log_update(k, n_in, n_changed, committed=True,
                         wall_ms=int((time.time() - t0) * 1000))
        _write_text(self.spark, f"{self.base}/{_CURRENT}",
                    json.dumps({"snap": k}))
        return {"snap": k, "pages_in": n_in, "changed": n_changed,
                "committed": True, "aliases_reused": aliases_reused}

    def update_from_warc(self, path: str, *, path_glob: str = "*.warc*",
                         strict: bool = False) -> dict:
        """Ingest one crawl snapshot straight from WARC archives: the
        directory's ``*.warc(.gz)`` files are framed archive-per-task
        (:func:`sources.warc.read_warc`), revisits within the snapshot
        resolve to the latest capture (``update`` applies the
        ``latest_by_key`` arg-max — pages carry ``warc_ts``), then the
        standard digest-diff delta runs."""
        from quickner_spark.sources.warc import read_warc
        return self.update(read_warc(self.spark, path, strict=strict,
                                     path_glob=path_glob))

    def _cur_stats(self, name: str, k: int) -> DataFrame:
        return self.spark.read.parquet(self._v(name, k))

    # below this many replaced urls, the subtraction scan pushes a
    # literal IN-list into the parquet source (row-group min/max skipping
    # on url-sorted files); above it, the join's runtime filtering is the
    # scale mechanism and a megabyte-scale literal plan would hurt
    MINUS_PUSHDOWN_MAX = 10_000

    def _replaced_pruning(self, replaced: DataFrame, n_replaced: int):
        """Bounded driver-side pruning info for the subtraction scans,
        computed ONCE per update: the distinct OLD snaps (at most the
        snapshot count — always collectable) and, only when the delta is
        small, the url IN-list. Never collects an unbounded url set."""
        snaps = sorted(r["snap"] for r in
                       replaced.select("snap").distinct().collect())
        urls = ([r["url"] for r in replaced.select("url").collect()]
                if n_replaced <= self.MINUS_PUSHDOWN_MAX else None)
        return snaps, urls

    def _minus(self, table: str, replaced: DataFrame, keys,
               pruning) -> DataFrame:
        """Negative counts of the replaced urls' OLD rows: read the
        per-snapshot partitions, join on (url, snap) — exactly the rows
        the old manifest pointed at (each url's rows are written once per
        content change, under the snap that processed it).

        Scan pruning, two levels: (a) the replaced rows' distinct OLD
        snaps become a literal partition filter — snapshots no replaced
        url lives in are never listed; (b) when the delta is small the
        url list is additionally pushed into the parquet scan as an IN
        filter, so row-group min/max stats skip unrelated data. The
        (url, snap) join stays either way — it is the correctness
        contract; the pushdowns only shrink what the scan feeds it."""
        snaps, urls = pruning
        old = self.spark.read.parquet(f"{self.base}/{table}")
        old = old.where(F.col("snap").isin(snaps) if snaps else F.lit(False))
        if urls is not None:
            old = old.where(F.col("url").isin(urls))
        return (old.join(replaced, ["url", "snap"])
                .groupBy(*keys).agg((-F.count("*")).alias("n")))

    @staticmethod
    def _merge(old: DataFrame, plus: DataFrame, minus: DataFrame,
               keys) -> DataFrame:
        """old + plus - minus on the aggregate grain; rows that reach
        n == 0 disappear (a surface whose last mention was replaced must
        not survive into the alias set). n < 0 is impossible when the
        subtraction reads the same rows the addition once counted."""
        return (old.unionByName(plus).unionByName(minus)
                .groupBy(*keys).agg(F.sum("n").alias("n"))
                .where(F.col("n") > 0))

    def _log_update(self, k: int, pages_in: int, changed: int,
                    committed: bool, wall_ms: int) -> None:
        (self.spark.createDataFrame(
            [(k, pages_in, changed, committed, wall_ms)],
            "snap int, pages_in long, changed long, committed boolean, "
            "wall_ms long")
         .repartition(1).write.mode("append")
         .parquet(f"{self.base}/_updates"))

    # -- reads ------------------------------------------------------------
    def nodes(self, snap: int | None = None) -> DataFrame:
        return self._cur("nodes", snap)

    def edges(self, snap: int | None = None) -> DataFrame:
        return self._cur("edges", snap)

    def aliases(self, snap: int | None = None) -> DataFrame:
        return self._cur("aliases", snap)

    def manifest(self, snap: int | None = None) -> DataFrame:
        return self._cur("manifest", snap)

    def updates(self) -> DataFrame:
        """Per-update lineage rows (snap, pages_in, changed, wall_ms)."""
        return self.spark.read.parquet(f"{self.base}/_updates")

    def _current_rows(self, table: str,
                      snap: int | None = None) -> DataFrame:
        """Current view of a per-snapshot doc-local table: rows whose
        (url, snap) the manifest points at. One doc-keyed equi-join —
        the same shuffle shape as every other doc-keyed stage join;
        after ``compact()`` the table side is a single snap partition,
        so the view's history tax is bounded by compaction cadence.

        ``snap=j`` time-travels: the join runs against manifest v{j}, so
        the view is the KG exactly as snapshot j committed it — every
        (url, snap<=j) pointer resolves because per-snapshot partitions
        are append-only until ``compact()``. Compaction folds the
        partitions a historical manifest points at, so a time-travel
        read validates the pointed-at partitions still exist and raises
        rather than silently returning an empty/partial view."""
        rows = self.spark.read.parquet(f"{self.base}/{table}")
        cur = self.manifest(snap).select("url", "snap")
        if snap is not None:
            have = {r["snap"] for r in
                    rows.select("snap").distinct().collect()}
            need = {r["snap"] for r in
                    cur.select("snap").distinct().collect()}
            if not need <= have:
                raise ValueError(
                    f"snapshot {snap} of {table!r} references partitions "
                    f"{sorted(need - have)} folded by compact(); history "
                    f"before the compaction point is gone")
        return rows.join(cur, ["url", "snap"]).drop("snap")

    def current_mentions(self, snap: int | None = None) -> DataFrame:
        return self._current_rows("mentions", snap)

    def current_triples(self, snap: int | None = None) -> DataFrame:
        return self._current_rows("triples", snap)

    def current_linked(self, snap: int | None = None) -> DataFrame:
        return self._current_rows("linked", snap)

    # -- maintenance ------------------------------------------------------
    def compact(self) -> int:
        """Fold all per-snapshot partitions into the CURRENT snapshot's
        partition and drop history: afterwards every manifest row points
        at snap=K and the current-view join prunes to one partition.
        Amortized full rewrite of the doc-local tables — run it when the
        snapshot count (not the data size) starts to hurt the view join.
        Returns the snapshot number everything now lives under."""
        k = self.snap()
        if k is None:
            raise ValueError(f"no committed snapshot under {self.base}")
        from quickner_spark.kg.pipeline import _hadoop_path

        cur_ptr = self.manifest().select("url", "snap")
        for table in ("mentions", "linked", "triples", "extract",
                      "digests"):
            rows = self.spark.read.parquet(f"{self.base}/{table}")
            cur = rows.join(cur_ptr, ["url", "snap"]).drop("snap")
            # two-step: materialize the view to a scratch dir BEFORE
            # deleting the partitions it reads from
            tmp = f"{self.base}/{table}__compact"
            cur.write.mode("overwrite").parquet(tmp)
            fs, root = _hadoop_path(self.spark, f"{self.base}/{table}")
            fs.delete(root, True)
            (self.spark.read.parquet(tmp)
             .write.mode("overwrite").parquet(self._part(table, k)))
            fs.delete(_hadoop_path(self.spark, tmp)[1], True)
        # repoint every manifest row at snap=K — same two-step (the new
        # manifest reads the file it replaces)
        tmp = f"{self.base}/manifest__compact"
        (self.manifest().withColumn("snap", F.lit(k))
         .write.mode("overwrite").parquet(tmp))
        fs, _ = _hadoop_path(self.spark, tmp)
        (self.spark.read.parquet(tmp)
         .write.mode("overwrite").parquet(self._v("manifest", k)))
        fs.delete(_hadoop_path(self.spark, tmp)[1], True)
        return k
