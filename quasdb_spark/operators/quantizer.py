"""Persisted IVF coarse quantizer (charter extension, SURVEY.md §2.7).

Production IVF trains the quantizer ONCE and persists it; queries only
LOAD centroids (the FAISS train()/write_index split). Round 2 trained
inside every query execution — the right arithmetic but the wrong
lifecycle: at 100 TB that re-collects a 65k-vector sample per run and
re-runs Lloyd per query. This module is the artifact layer:

- ``get_or_train(...)`` returns centroids as a tiny DataFrame, loading
  them from a JSON artifact (or a process-local cache) when one exists
  for the same (corpus fingerprint, hyperparameters); it trains only on
  a miss, then persists atomically (tmp + rename).
- ``retrain(...)`` is the maintenance hook: force a fresh training run
  and overwrite the artifact (what a production pipeline schedules
  after enough corpus drift — cf. the per-list fit diagnostics in
  suite.q_sim_ivf_quantization).

Determinism: centroids are float64 and round-trip EXACTLY through the
artifact (Python json uses shortest-round-trip repr for floats; Spark
collect/createDataFrame are float64 both ways), so a loaded quantizer
scores bit-identically to a freshly trained one — the DuckDB oracles
that unroll the training keep matching.

Scale: the artifact is k x dims doubles (a few KB) — broadcast-sized
by construction. The fingerprint hashes parquet file (path, size,
mtime) stats, NOT contents, so computing it never scans the corpus.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession

from quasdb_spark.operators.similarity import kmeans_centroids

_SCHEMA = "c_label long, centroid array<double>"

# process-local cache: artifact_key -> list[(label, [floats])]
_MEM: dict[str, list] = {}
# open-handle memo: loaded artifact DataFrames, keyed by (Spark app id,
# artifact key/path, sidecar mtime_ns). A DataFrame is a lazy plan —
# holding one caches NO data, it only skips the per-query py4j
# createDataFrame / datasource-resolution round-trips (~0.2-0.3 s per
# warm ivf query at sf0.1, guide §1.2: the production engine keeps the
# index handle open between searches; re-opening it per query was
# accidental overhead, not a semantic). Invalidation mirrors
# _TUNED_MEMO: every build/append/retune/adopt rewrites the sidecar,
# bumping its mtime and forcing a fresh read.
_DF_MEMO: dict[tuple, DataFrame] = {}
# ensure_tuned healthy-verdict memo: (artifact path, sidecar
# mtime_ns, cap) -> (n_clusters, n_vectors). Sidecar rewrites
# (append/retune/adopt) bump the mtime, invalidating the entry.
_TUNED_MEMO: dict[tuple, tuple] = {}
_LOCK = threading.Lock()


def artifact_root() -> str:
    """Where quantizer artifacts live. Override with
    $QUASDB_ARTIFACT_DIR; defaults under the system temp dir. On a
    real cluster this is a shared path (the artifact is written by the
    driver and only ever read back by the driver — executors see
    centroids via broadcast, never via this file)."""
    return os.environ.get(
        "QUASDB_ARTIFACT_DIR",
        os.path.join(tempfile.gettempdir(), "quasdb_spark_artifacts"))


def corpus_fingerprint(path: str) -> str:
    """Cheap corpus identity: md5 over (relative path, size, mtime_ns)
    of every data file under ``path`` (a parquet file or directory).
    No data is read — O(#files) stat calls."""
    path = os.path.abspath(path)
    h = hashlib.md5(path.encode())
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())
        return h.hexdigest()
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            st = os.stat(os.path.join(root, f))
            rel = os.path.relpath(os.path.join(root, f), path)
            h.update(f"|{rel}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def _key(fingerprint: str, n_clusters: int, n_iter: int,
         sample_cap: int | None, round_to: int) -> str:
    return hashlib.md5(
        f"{fingerprint}|k={n_clusters}|it={n_iter}|cap={sample_cap}"
        f"|rt={round_to}".encode()).hexdigest()


def _artifact_path(key: str, root: str | None = None) -> str:
    return os.path.join(root or artifact_root(), f"ivf_{key}.json")


def _save(rows: list, path: str, meta: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"meta": meta,
               "centroids": [[int(l), list(map(float, c))] for l, c in rows]}
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)  # atomic publish
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load(path: str) -> list | None:
    try:
        with open(path) as f:
            payload = json.load(f)
        return [(int(l), [float(x) for x in c])
                for l, c in payload["centroids"]]
    except (OSError, ValueError, KeyError):
        return None


class QuantizerMiss(RuntimeError):
    """Raised when a query needs centroids but no artifact exists and
    implicit training is disabled (QUASDB_IVF_ON_MISS=raise)."""


class StaleIndexError(RuntimeError):
    """Raised when a search runs against inverted lists whose recorded
    corpus fingerprint no longer matches the live corpus — vectors
    added/compacted/tombstoned out of the store since the lists were
    built would silently (re)appear as neighbors. Rebuild or maintain
    the artifact (get_or_build_lists(force=True) / append_to_lists /
    drop_from_lists), or pass allow_stale=True to search anyway. The
    reference never serves files its manifest GC'd
    (kv/db/db_impl.cpp:248-320); index artifacts get the same
    discipline."""


_META_NAME = "_quasdb_meta.json"
_DROP_MARKER = "_DROP_IN_PROGRESS"


def _drop_in_progress(path: str) -> bool:
    """True while (or after a crash during) a partition-swap drop:
    the marker is written BEFORE the first swap and cleared only
    after the final sidecar commit, so a half-swapped artifact —
    which still has an intact _SUCCESS and the OLD fingerprint —
    is detectable and check_fresh() rejects it instead of serving
    stale/partial lists silently."""
    return os.path.exists(os.path.join(path, _DROP_MARKER))


def _write_artifact_meta(path: str, meta: dict) -> None:
    """Sidecar metadata for a directory artifact (fingerprint the
    lists/codes were built against + maintenance audit trail).
    Atomic publish, same as the JSON artifacts. Stamps the artifact
    directory into the meta so a frame carrying it can re-locate the
    directory (check_fresh's half-drop detection)."""
    os.makedirs(path, exist_ok=True)
    meta["path"] = path
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, _META_NAME))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _ensure_meta(path: str, fingerprint: str, key: str) -> dict:
    """Meta for a loaded artifact, ADOPTING artifacts that predate
    sidecar stamping: the artifact path is keyed by the fingerprint,
    so the requested fingerprint IS its provenance by construction —
    writing the sidecar on first load makes check_fresh enforceable
    on legacy artifacts instead of silently passing them. The
    adoption write is best-effort: a legacy artifact on a READ-ONLY
    mount still loads (the guard simply can't enforce on it, same as
    before stamping existed). The returned meta's ``path`` is always
    the directory we actually loaded from — a sidecar copied/moved
    with its tree records its ORIGINAL path, and the half-drop marker
    must be probed where the data actually lives."""
    meta = read_artifact_meta(path)
    if meta is None:
        meta = {"fingerprint": fingerprint, "key": key,
                "ops": ["adopted"]}
        try:
            _write_artifact_meta(path, meta)
        except OSError:
            pass
    meta["path"] = path
    return meta


def read_artifact_meta(path: str) -> dict | None:
    """The sidecar metadata of a lists/codes artifact directory, or
    None for artifacts that predate meta stamping."""
    try:
        with open(os.path.join(path, _META_NAME)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def check_fresh(lists: DataFrame, corpus_fingerprint: str, *,
                allow_stale: bool = False) -> None:
    """Staleness guard used by similarity.ivf_topk/ivfpq_topk: assert
    the artifact behind ``lists`` was built/maintained against
    ``corpus_fingerprint``. The artifact is located from the frame's
    stamped metadata (set by every build/append/drop in this module)
    or, for a frame read directly from parquet, from its input files'
    directory. Unstamped artifacts (no sidecar) pass — the guard can
    only enforce what maintenance recorded."""
    if allow_stale:
        return
    meta = getattr(lists, "_quasdb_ivf_meta", None)
    if meta is None:
        try:
            files = lists.inputFiles()
            if not files:
                return
            d = os.path.dirname(files[0].replace("file:", ""))
            # partitioned layouts nest one level (.../list_label=N/x.parquet)
            if os.path.basename(d).startswith("list_label="):
                d = os.path.dirname(d)
            meta = read_artifact_meta(d)
            if meta is not None:
                # the marker lives where the DATA lives: prefer the
                # directory backing the frame over the path recorded
                # in a (possibly relocated) sidecar
                meta["path"] = d
        except Exception:
            return
    if meta and meta.get("path") and _drop_in_progress(meta["path"]):
        raise StaleIndexError(
            f"index artifact at {meta['path']} has a drop in progress "
            "(or a drop crashed mid-swap): some list partitions may be "
            "rewritten and others not — rebuild with "
            "get_or_build_lists(force=True), or pass allow_stale=True "
            "to search the partial artifact anyway")
    if meta and meta.get("fingerprint") not in (None, corpus_fingerprint):
        raise StaleIndexError(
            f"index artifact was built against corpus fingerprint "
            f"{meta.get('fingerprint', '')[:12]}… but the live corpus "
            f"is {corpus_fingerprint[:12]}…; rebuild or maintain the "
            "artifact (get_or_build_lists(force=True) / "
            "append_to_lists / drop_from_lists), or pass "
            "allow_stale=True to search the stale index anyway")


def _stamp(df: DataFrame, meta: dict | None) -> DataFrame:
    df._quasdb_ivf_meta = meta
    return df


def _memo_read(spark: SparkSession, path: str, schema: str,
               fingerprint: str, key: str) -> DataFrame:
    """Read a parquet artifact through the open-handle memo: the lazy
    scan DataFrame is reused per (app, path, sidecar mtime) — see
    _DF_MEMO. The stamped meta is re-derived each call so relocated /
    adopted sidecars behave exactly as before."""
    meta = _ensure_meta(path, fingerprint, key)
    try:
        mtime = os.stat(os.path.join(path, _META_NAME)).st_mtime_ns
    except OSError:
        mtime = None
    mk = ("scan", spark.sparkContext.applicationId, path, schema, mtime)
    if mtime is not None:
        with _LOCK:
            df = _DF_MEMO.get(mk)
        if df is not None:
            return _stamp(df, meta)
    df = spark.read.schema(schema).parquet(path)
    if mtime is not None:
        with _LOCK:
            _DF_MEMO[mk] = df
    return _stamp(df, meta)


def get_or_train(vectors: DataFrame, n_clusters: int, *,
                 fingerprint: str, id_col: str = "vec_id",
                 vec_col: str = "embedding", n_iter: int = 2,
                 round_to: int = 6, sample_cap: int | None = None,
                 root: str | None = None,
                 force: bool = False,
                 on_miss: str | None = None) -> DataFrame:
    """Centroids for ``vectors``, trained at most once per
    (fingerprint, hyperparameters). Returns the same
    (c_label, centroid) frame as kmeans_centroids — a LocalTableScan
    in the plan, no training stage.

    ``on_miss`` (default from $QUASDB_IVF_ON_MISS, else 'train')
    controls the artifact-miss lifecycle: 'train' trains inline (fine
    for notebooks/tests), 'warn' trains but logs loudly, 'raise'
    fails with QuantizerMiss — the production setting: a QUERY must
    never absorb a training job; schedule ``retrain`` instead
    (VERDICT r3: a cold cache put 31 s of driver k-means inside the
    first query execution)."""
    spark = vectors.sparkSession
    key = _key(fingerprint, n_clusters, n_iter, sample_cap, round_to)
    path = _artifact_path(key, root)
    if not force:
        with _LOCK:
            rows = _MEM.get(key)
        if rows is None:
            rows = _load(path)
            if rows is not None:
                with _LOCK:
                    _MEM[key] = rows
        if rows is not None:
            mk = ("cents", spark.sparkContext.applicationId, key)
            with _LOCK:
                df = _DF_MEMO.get(mk)
            if df is None:
                df = spark.createDataFrame(rows, _SCHEMA)
                with _LOCK:
                    _DF_MEMO[mk] = df
            return df
        mode = on_miss or os.environ.get("QUASDB_IVF_ON_MISS", "train")
        if mode == "raise":
            raise QuantizerMiss(
                f"no quantizer artifact for key {key} "
                f"(fingerprint {fingerprint[:12]}…, k={n_clusters}); "
                "run retrain() as a maintenance job — implicit "
                "training inside queries is disabled")
        if mode == "warn":
            import sys

            print(f"quasdb_spark.quantizer: WARNING — training "
                  f"quantizer inside a query (key {key}); schedule "
                  f"retrain() instead", file=sys.stderr)
    cents = kmeans_centroids(vectors, n_clusters, id_col=id_col,
                             vec_col=vec_col, n_iter=n_iter,
                             round_to=round_to, sample_cap=sample_cap)
    rows = sorted((r["c_label"], list(r["centroid"]))
                  for r in cents.collect())
    _save(rows, path, {"fingerprint": fingerprint, "k": n_clusters,
                       "n_iter": n_iter, "sample_cap": sample_cap,
                       "round_to": round_to})
    df = spark.createDataFrame(rows, _SCHEMA)
    with _LOCK:
        _MEM[key] = rows
        _DF_MEMO[("cents", spark.sparkContext.applicationId, key)] = df
    return df


_LISTS_SCHEMA = ("vec_id long, vec array<double>, vec_norm double, "
                 "list_label long")


def lists_path(key: str, root: str | None = None) -> str:
    return os.path.join(root or artifact_root(), f"ivf_lists_{key}")


def get_or_build_lists(vectors: DataFrame, centroids: DataFrame, *,
                       fingerprint: str, n_clusters: int,
                       n_iter: int = 2, round_to: int = 6,
                       sample_cap: int | None = None,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       root: str | None = None,
                       force: bool = False,
                       assign: str = "sql") -> DataFrame:
    """Materialized IVF inverted lists for (corpus, quantizer) — the
    add() half of the FAISS train()/add() split. Built at most once
    per key: one full-corpus assignment pass (similarity.ivf_assign)
    written as parquet PARTITIONED BY list_label, then queries read it
    back and only PROBE — the broadcast probe join dynamic-partition-
    prunes the scan down to the nprobe lists actually probed, so the
    per-query cost is |probed lists|, never the corpus.

    The explicit read schema pins ``list_label`` to LONG (partition
    inference would narrow it to INT, and the resulting cast on the
    partition column defeats DPP). Rebuild (``force=True``) is the
    maintenance hook after retrain()/corpus drift — same lifecycle as
    the quantizer artifact, and keyed identically.

    ``assign='blocked'`` runs the assignment as the Arrow-batched
    numpy pass (similarity.ivf_assign_blocked) instead of the SQL
    crossJoin — the maintenance path for large nlist, where the SQL
    plan materializes n x nlist rows each paying a 64-dim fold
    (ensure_tuned's retunes use it; see that docstring for the
    last-ulp caveat). The sidecar records build params + row count so
    ensure_tuned can shape-check and re-key without touching the
    corpus."""
    from quasdb_spark.operators.similarity import (ivf_assign,
                                                   ivf_assign_blocked)

    key = _key(fingerprint, n_clusters, n_iter, sample_cap, round_to)
    path = lists_path(key, root)
    spark = vectors.sparkSession
    # a half-swapped drop (crash between marker and sidecar commit)
    # makes the artifact unusable — rebuild, don't reuse
    if force or _drop_in_progress(path) \
            or not os.path.exists(os.path.join(path, "_SUCCESS")):
        assigner = (ivf_assign_blocked if assign == "blocked"
                    else ivf_assign)
        (assigner(vectors, centroids, id_col=id_col, vec_col=vec_col)
         .write.mode("overwrite").partitionBy("list_label")
         .parquet(path))
        n_vecs = spark.read.schema(_LISTS_SCHEMA).parquet(path).count()
        _write_artifact_meta(path, {
            "fingerprint": fingerprint, "key": key, "ops": ["build"],
            "n_vectors": n_vecs,
            "params": {"n_clusters": n_clusters, "n_iter": n_iter,
                       "sample_cap": sample_cap, "round_to": round_to}})
    return _memo_read(spark, path, _LISTS_SCHEMA, fingerprint, key)


def append_to_lists(new_vectors: DataFrame, centroids: DataFrame, *,
                    fingerprint: str, n_clusters: int,
                    n_iter: int = 2, round_to: int = 6,
                    sample_cap: int | None = None,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    root: str | None = None,
                    new_fingerprint: str | None = None) -> DataFrame:
    """Incremental add: assign ONLY the new vectors against the
    existing quantizer and append them to the materialized lists —
    the add() path for a growing corpus, no retraining and no
    full-corpus reassignment (real IVF deployments retrain on drift,
    not on every insert; q_sim_ivf_quantization's fit diagnostics are
    the retrain trigger). Cost is one assignment pass over the NEW
    vectors; the partitioned layout is preserved so probe-side
    dynamic partition pruning is unaffected.

    The caller owns id uniqueness (appending an id already in the
    lists yields duplicate index entries, exactly like FAISS add()
    with a repeated id). The lists must already exist for this key —
    appending into a missing artifact raises (build first with
    get_or_build_lists)."""
    from quasdb_spark.operators.similarity import ivf_assign

    key = _key(fingerprint, n_clusters, n_iter, sample_cap, round_to)
    path = lists_path(key, root)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise QuantizerMiss(
            f"no inverted lists at {path}; build with "
            f"get_or_build_lists before appending")
    if _drop_in_progress(path):
        raise StaleIndexError(
            f"drop in progress (or crashed mid-swap) at {path}; "
            "rebuild with get_or_build_lists(force=True) before "
            "appending")
    spark = new_vectors.sparkSession
    (ivf_assign(new_vectors, centroids, id_col=id_col, vec_col=vec_col)
     .write.mode("append").partitionBy("list_label").parquet(path))
    meta = read_artifact_meta(path) or {"fingerprint": fingerprint,
                                        "key": key, "ops": []}
    # an append changes what the lists index: when the caller passes
    # the GROWN corpus's fingerprint, searches checked against the old
    # corpus now fail fresh-checks (and vice versa)
    if new_fingerprint is not None:
        meta["fingerprint"] = new_fingerprint
    meta["ops"] = (meta.get("ops") or []) + ["append"]
    meta.pop("n_vectors", None)  # stale — ensure_tuned recounts
    _write_artifact_meta(path, meta)
    return _stamp(spark.read.schema(_LISTS_SCHEMA).parquet(path), meta)


def _ids_frame(spark: SparkSession, ids, id_col: str = "vec_id"):
    """Normalize a delete set (iterable of ints or a DataFrame with
    ``id_col``) to a one-column frame. Driver-local id lists are the
    expected case (deletes arrive in bounded batches, like the
    store's tombstones); a DataFrame passes through for bigger sets."""
    if isinstance(ids, DataFrame):
        return ids.select(ids[id_col].cast("long").alias("vec_id"))
    return spark.createDataFrame([(int(i),) for i in ids],
                                 "vec_id long")


def _swap_dirs(dst: str, src: str, trash: str) -> None:
    """dst <- src via rename, parking the old dst in ``trash``.
    Artifacts are rebuildable caches (unlike the store's manifest-
    committed data): a crash mid-swap loses only the artifact, and
    recovery is get_or_build_*(force=True)."""
    if os.path.exists(dst):
        os.makedirs(trash, exist_ok=True)
        os.rename(dst, os.path.join(trash, os.path.basename(dst)
                                    + f".{len(os.listdir(trash))}"))
    if os.path.exists(src):
        os.rename(src, dst)
    # else: every row of this partition was deleted — dst stays absent


def drop_from_lists(spark: SparkSession, ids, *, fingerprint: str,
                    n_clusters: int, n_iter: int = 2,
                    round_to: int = 6,
                    sample_cap: int | None = None,
                    root: str | None = None,
                    new_fingerprint: str | None = None) -> DataFrame:
    """Delete vectors from the materialized inverted lists — the
    remove_ids() half of the index lifecycle (r10 VERDICT: vectors
    compacted/tombstoned out of a store left stale list entries that
    searches kept returning). BOUNDED rewrite, the compaction
    discipline applied to the index artifact:

    1. one column-pruned scan finds which list_label partitions
       contain doomed ids (broadcast semi-join on vec_id);
    2. only those partitions are rewritten (anti-join) into a staging
       dir and swapped in per-partition — cost is proportional to the
       AFFECTED lists, never the corpus;
    3. the sidecar meta records the drop (and the new corpus
       fingerprint when given), so check_fresh() keeps working.

    ``ids`` is an iterable of vec_ids or a DataFrame with a vec_id
    column. Returns the fresh lists frame. Crash mid-swap can only
    lose the artifact (rebuildable with force=True), never store
    data."""
    import shutil

    key = _key(fingerprint, n_clusters, n_iter, sample_cap, round_to)
    path = lists_path(key, root)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise QuantizerMiss(
            f"no inverted lists at {path}; build with "
            f"get_or_build_lists before dropping")
    if _drop_in_progress(path):
        raise StaleIndexError(
            f"a previous drop at {path} is in progress or crashed "
            "mid-swap; rebuild with get_or_build_lists(force=True)")
    from pyspark.sql import functions as F

    ids_df = _ids_frame(spark, ids)
    lists = spark.read.schema(_LISTS_SCHEMA).parquet(path)
    affected = sorted(
        r.list_label for r in
        (lists.select("vec_id", "list_label")
         .join(F.broadcast(ids_df), "vec_id")
         .select("list_label").distinct().collect()))
    if affected:
        staging = path + ".drop_staging"
        trash = path + ".drop_trash"
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        (lists.where(F.col("list_label").isin(affected))
         .join(F.broadcast(ids_df), "vec_id", "left_anti")
         .write.mode("overwrite").partitionBy("list_label")
         .parquet(staging))
        # in-progress marker BEFORE the first swap: a crash mid-swap
        # leaves _SUCCESS and the old fingerprint intact, so without
        # the marker check_fresh would accept a half-dropped artifact
        # and serve stale/partial lists silently
        with open(os.path.join(path, _DROP_MARKER), "w") as f:
            json.dump({"partitions": affected}, f)
        for lbl in affected:
            _swap_dirs(os.path.join(path, f"list_label={lbl}"),
                       os.path.join(staging, f"list_label={lbl}"),
                       trash)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
    meta = read_artifact_meta(path) or {"fingerprint": fingerprint,
                                        "key": key, "ops": []}
    if new_fingerprint is not None:
        meta["fingerprint"] = new_fingerprint
    meta["ops"] = (meta.get("ops") or []) + [
        {"drop": len(affected), "partitions": affected}]
    meta.pop("n_vectors", None)  # stale — ensure_tuned recounts
    _write_artifact_meta(path, meta)
    # marker cleared only after the sidecar commit — the last step
    if affected:
        os.unlink(os.path.join(path, _DROP_MARKER))
    return _stamp(spark.read.schema(_LISTS_SCHEMA).parquet(path), meta)


def _drop_from_flat(spark: SparkSession, ids, path: str, schema: str,
                    miss_msg: str) -> DataFrame:
    """Full staged rewrite of an unpartitioned codes artifact minus
    ``ids`` — the FAISS remove_ids() cost model (O(n) compaction of a
    flat code array; at m·log2(k) bits per vector the whole artifact
    is ~1000x smaller than the corpus it indexes)."""
    import shutil

    from pyspark.sql import functions as F

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise QuantizerMiss(miss_msg)
    ids_df = _ids_frame(spark, ids)
    staging = path + ".drop_staging"
    trash = path + ".drop_trash"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    (spark.read.schema(schema).parquet(path)
     .join(F.broadcast(ids_df), "vec_id", "left_anti")
     .write.mode("overwrite").parquet(staging))
    meta = read_artifact_meta(path)
    os.rename(path, trash)
    os.rename(staging, path)
    shutil.rmtree(trash, ignore_errors=True)
    if meta is not None:
        meta["ops"] = (meta.get("ops") or []) + ["drop"]
        _write_artifact_meta(path, meta)
    return _stamp(spark.read.schema(schema).parquet(path), meta)


def drop_from_codes(spark: SparkSession, ids, *, fingerprint: str,
                    m: int = 4, k: int = 8, n_iter: int = 2,
                    sample_cap: int | None = 65536,
                    round_to: int = 6,
                    root: str | None = None) -> DataFrame:
    """Delete vectors from the row-layout PQ codes artifact."""
    key = _pq_key(fingerprint, m, k, n_iter, sample_cap, round_to)
    path = pq_codes_path(key, root)
    return _drop_from_flat(
        spark, ids, path, _CODES_SCHEMA,
        f"no PQ codes at {path}; build with get_or_build_codes first")


def drop_from_codes_array(spark: SparkSession, ids, *,
                          fingerprint: str, m: int = 4, k: int = 8,
                          n_iter: int = 2,
                          sample_cap: int | None = 65536,
                          round_to: int = 6,
                          root: str | None = None) -> DataFrame:
    """Delete vectors from the array-layout PQ codes artifact (the
    serving layout ivfpq_topk scores with)."""
    key = _pq_key(fingerprint, m, k, n_iter, sample_cap, round_to)
    path = pq_codes_array_path(key, root)
    return _drop_from_flat(
        spark, ids, path, _CODES_ARRAY_SCHEMA,
        f"no PQ codes-array at {path}; build with "
        f"get_or_build_codes_array first")


def retrain(vectors: DataFrame, n_clusters: int, *, fingerprint: str,
            **kw) -> DataFrame:
    """Maintenance hook: force a fresh training run, overwriting any
    artifact for this key (run when q_sim_ivf_quantization's fit
    diagnostics degrade, or after corpus drift)."""
    return get_or_train(vectors, n_clusters, fingerprint=fingerprint,
                        force=True, **kw)


def index_health(lists: DataFrame, centroids: DataFrame, *,
                 n_clusters: int) -> dict:
    """Diagnostics over the MATERIALIZED lists (the corpus is never
    touched): per-list sizes plus fit (cosine of each stored vector to
    its assigned centroid, the q_sim_ivf_quantization numbers computed
    from the artifact instead of a fresh assignment). One map-only
    pass over the lists with a broadcast k-row join and a k-keyed
    aggregate. Returns the signals a production ANN deployment
    watches: {n_vectors, n_lists, empty_lists, size_skew (largest
    list / mean), avg_cos, min_list_avg_cos}."""
    from pyspark.sql import functions as F

    from quasdb_spark.operators.similarity import cosine

    per = (lists.join(F.broadcast(centroids.select(
                F.col("c_label").alias("list_label"), "centroid")),
                "list_label")
           .select("list_label",
                   F.round(cosine(F.col("vec"), F.col("centroid")), 6)
                   .alias("_cs"))
           .groupBy("list_label")
           .agg(F.count(F.lit(1)).alias("n"),
                F.avg("_cs").alias("avg_cos")))
    rows = per.collect()   # k rows — driver-bounded by construction
    n_vecs = sum(r.n for r in rows)
    mean = n_vecs / max(len(rows), 1)
    return {
        "n_vectors": n_vecs,
        "n_lists": len(rows),
        "empty_lists": n_clusters - len(rows),
        "size_skew": round(max((r.n for r in rows), default=0)
                           / mean, 3) if mean else None,
        "avg_cos": round(sum(r.avg_cos * r.n for r in rows) / n_vecs, 6)
        if n_vecs else None,
        "min_list_avg_cos": round(min((r.avg_cos for r in rows),
                                      default=0.0), 6),
    }


def maybe_retrain(vectors: DataFrame, centroids: DataFrame,
                  lists: DataFrame, *, fingerprint: str,
                  n_clusters: int, n_iter: int = 2,
                  round_to: int = 6, sample_cap: int | None = None,
                  max_size_skew: float = 4.0,
                  min_avg_cos: float = 0.0,
                  max_empty_lists: int = 0,
                  root: str | None = None,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> dict:
    """The compaction-picking analogue for the ANN index
    (store.maybe_compact : compaction_score :: maybe_retrain :
    index_health — closing the 'deletion & rebalance' lifecycle,
    r10 VERDICT missing #1): measure the materialized index's health
    and retrain + rebuild ONLY when a trigger fires —

    - ``size_skew`` > max_size_skew: drifted corpora pile into few
      lists, so probes scan a corpus-sized list (the imbalance that
      erases the nlist/nprobe advantage);
    - ``avg_cos`` < min_avg_cos: centroids no longer describe the
      vectors (fit drift);
    - ``empty_lists`` > max_empty_lists: dead capacity.

    Healthy index: NOTHING is rewritten (artifacts untouched —
    pinned by test). Unhealthy: retrain() + get_or_build_lists(force)
    against the CURRENT corpus, meta op-trail records 'retrain'.
    Returns {"retrained", "health", "centroids", "lists"} — on
    retrain, health is re-measured on the rebuilt index."""
    health = index_health(lists, centroids, n_clusters=n_clusters)
    trigger = ((health["size_skew"] or 0) > max_size_skew
               or (health["avg_cos"] is not None
                   and health["avg_cos"] < min_avg_cos)
               or health["empty_lists"] > max_empty_lists)
    if not trigger:
        return {"retrained": False, "health": health,
                "centroids": centroids, "lists": lists}
    cents = retrain(vectors, n_clusters, fingerprint=fingerprint,
                    n_iter=n_iter, round_to=round_to,
                    sample_cap=sample_cap, root=root,
                    id_col=id_col, vec_col=vec_col)
    new_lists = get_or_build_lists(vectors, cents,
                                   fingerprint=fingerprint,
                                   n_clusters=n_clusters, n_iter=n_iter,
                                   round_to=round_to,
                                   sample_cap=sample_cap,
                                   id_col=id_col, vec_col=vec_col,
                                   root=root, force=True)
    key = _key(fingerprint, n_clusters, n_iter, sample_cap, round_to)
    path = lists_path(key, root)
    meta = read_artifact_meta(path) or {"fingerprint": fingerprint,
                                        "key": key, "ops": []}
    meta["ops"] = (meta.get("ops") or []) + ["retrain"]
    _write_artifact_meta(path, meta)
    return {"retrained": True,
            "health": index_health(new_lists, cents,
                                   n_clusters=n_clusters),
            "centroids": cents, "lists": _stamp(new_lists, meta)}


# An inverted list larger than the quantizer's own training sample is
# shape-broken by construction: the quantizer cannot have resolved that
# region of the space, and a single probe scans more candidates than a
# 64k-corpus brute force would. Coincides with the default training
# sample_cap on purpose.
_AUTO_MAX_LIST_ROWS = 65536


def ensure_tuned(centroids: DataFrame, lists: DataFrame, *,
                 fingerprint: str | None = None,
                 mode: str = "auto",
                 max_avg_list_rows: int | None = None,
                 target_nlist: int | None = None) -> dict:
    """The WRITE/READ-path-scheduled maintenance trigger for the ANN
    index — the exact analogue of the store's maybe_compact tick
    (reference: compaction is scheduled from the read/write paths,
    kv/db/db_impl.cpp:770-775, never invoked by a benchmark): called
    by ivf_topk/ivfpq_topk on every materialized-lists search, it
    SHAPE-CHECKS the index against its own sidecar (zero Spark jobs
    when the build recorded ``n_vectors``) and, when the average
    inverted list has outgrown ``max_avg_list_rows`` (default 65536 =
    the training sample cap — see _AUTO_MAX_LIST_ROWS), retunes:

    - ``mode='auto'``: retrain at nlist' = max(isqrt(n), nlist+1) on
      the lists' own vectors (the corpus in inverted layout — no
      original frame needed) and rebuild the lists under the new key
      via the blocked numpy assigner. Idempotent and cached: the
      retuned artifact persists, so the next query's check loads it
      for the cost of a JSON read. VERDICT r13 #1: without this, a
      suite-shaped nlist=10 index over 2M vectors sent 8x10^9
      candidate rows into one shuffle and spilled the disk dry.
    - ``mode='error'``: raise StaleIndexError naming the blowup — the
      refuse-loudly alternative for deployments that schedule
      retraining themselves.
    - ``mode='off'``: legacy behavior, no check.

    Pre-r14 artifacts (sidecar without ``params``) get the SAME auto
    treatment: the retrain falls back to the observed shape
    (``n_clusters_observed``, counted once) plus the module's default
    hyperparameters — a previously-working-but-slow search must keep
    working after upgrade, it just gets fast (ADVICE r14 #1; only an
    artifact with no recoverable fingerprint still refuses, since a
    retune cannot be keyed or cached without one).

    Unstamped frames (ad-hoc lists built inline, not artifact-backed)
    pass untouched — the policy can only enforce what maintenance
    recorded, same contract as check_fresh. Returns {"retuned",
    "centroids", "lists", "n_clusters", "n_clusters_before",
    "n_vectors"}; ``n_clusters_before`` is the pre-retune shape so
    callers can rescale ``nprobe`` to keep the probed corpus
    fraction comparable (similarity.ivf_topk does).

    A healthy verdict is memoized per (artifact path, sidecar mtime)
    for the life of the process, so repeat queries against the same
    artifact skip even the shape arithmetic — one os.stat per call
    (VERDICT r14 board #7). Any sidecar rewrite (append, retune,
    adoption) changes the mtime and invalidates the memo.

    Concurrency contract (VERDICT r14 board #6): retunes to the same
    target key are serialized by an flock on the keyed artifact path
    (threads and processes alike) — exactly ONE caller trains and
    builds; every other concurrent caller blocks, then loads the
    finished artifact. No torn parquet, no torn sidecar."""
    import math

    out = {"retuned": False, "centroids": centroids, "lists": lists,
           "n_clusters": None, "n_clusters_before": None,
           "n_vectors": None, "cap": None}
    if mode == "off":
        return out
    if mode not in ("auto", "error"):
        raise ValueError(f"ensure_tuned: unknown mode {mode!r} "
                         "(expected 'auto', 'error' or 'off')")
    meta = getattr(lists, "_quasdb_ivf_meta", None)
    if meta is None or not meta.get("path"):
        return out
    cap = max_avg_list_rows if max_avg_list_rows is not None \
        else _AUTO_MAX_LIST_ROWS
    out["cap"] = cap
    sidecar = os.path.join(meta["path"], _META_NAME)
    try:
        mtime = os.stat(sidecar).st_mtime_ns
    except OSError:
        mtime = None
    memo_key = (meta["path"], mtime, cap)
    if mtime is not None:
        with _LOCK:
            verdict = _TUNED_MEMO.get(memo_key)
        if verdict is not None:
            out["n_clusters"], out["n_vectors"] = verdict
            return out
    params = meta.get("params") or {}
    n_clusters = params.get("n_clusters") \
        or meta.get("n_clusters_observed")
    dirty = False
    if n_clusters is None:
        # legacy sidecar without params: the centroid frame is tiny
        # (LocalTableScan) — count it ONCE and record the observation
        # so later checks on this artifact stay job-free
        try:
            n_clusters = centroids.count()
        except Exception:
            return out
        meta["n_clusters_observed"] = n_clusters
        dirty = True
    n_vectors = meta.get("n_vectors")
    if n_vectors is None:
        # legacy artifact: count once (a parquet metadata scan), then
        # record it so every later check is free
        n_vectors = lists.count()
        meta["n_vectors"] = n_vectors
        dirty = True
    if dirty:
        try:
            _write_artifact_meta(meta["path"], dict(meta))
        except OSError:
            pass
    out["n_clusters"], out["n_vectors"] = n_clusters, n_vectors
    out["n_clusters_before"] = n_clusters
    avg = n_vectors / max(n_clusters, 1)
    if avg <= cap:
        if mtime is not None:
            with _LOCK:
                _TUNED_MEMO[memo_key] = (n_clusters, n_vectors)
        return out
    nlist2 = target_nlist or max(int(math.isqrt(n_vectors)),
                                 n_clusters + 1)
    fp = fingerprint or meta.get("fingerprint")
    if mode == "error" or not fp:
        hint = ("" if fp else " (artifact records no corpus "
                "fingerprint — a retune cannot be keyed/cached; "
                "rebuild with get_or_build_lists to enable auto)")
        raise StaleIndexError(
            f"index is SHAPE-BROKEN for its corpus: {n_vectors} vectors "
            f"over {n_clusters} lists = {int(avg)} candidates scanned "
            f"per probe (cap {cap}) — a search would shuffle "
            f"~nprobe x {int(avg)} rows per query. Retrain at "
            f"nlist~{nlist2} (quantizer.retrain + get_or_build_lists"
            f"(force=True)), or search with maintenance='auto'{hint}")
    root = os.path.dirname(meta["path"]) or None
    # pre-r14 sidecar without params: retune on the observed shape +
    # module defaults instead of refusing (ADVICE r14 #1 — auto must
    # not turn a working slow search into a hard failure on upgrade)
    n_iter = params.get("n_iter", 2)
    sample_cap = params.get("sample_cap", _AUTO_MAX_LIST_ROWS) \
        if params else _AUTO_MAX_LIST_ROWS
    round_to = params.get("round_to", 6)
    vecs = lists.select("vec_id",
                        lists["vec"].alias("embedding"))
    key2 = _key(fp, nlist2, n_iter, sample_cap, round_to)
    path2 = lists_path(key2, root)
    # Single-winner retune (VERDICT r14 board #6): two handles hitting
    # the same shape-broken artifact concurrently must not both run
    # Spark overwrite jobs into path2 (interleaved file commits could
    # tear the artifact). An flock on the target key serializes them:
    # the winner trains + builds; the loser blocks, then finds the
    # finished artifact (_SUCCESS + cached quantizer) and just loads
    # it. Works across threads AND processes (per-open-fd flock).
    import fcntl

    os.makedirs(os.path.dirname(path2) or ".", exist_ok=True)
    lock_fd = os.open(path2 + ".retune.lock",
                      os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(lock_fd, fcntl.LOCK_EX)
        cents2 = get_or_train(vecs, nlist2, fingerprint=fp,
                              n_iter=n_iter, sample_cap=sample_cap,
                              round_to=round_to, root=root)
        lists2 = get_or_build_lists(vecs, cents2, fingerprint=fp,
                                    n_clusters=nlist2, n_iter=n_iter,
                                    sample_cap=sample_cap,
                                    round_to=round_to, root=root,
                                    assign="blocked")
        meta2 = read_artifact_meta(path2) or {"fingerprint": fp,
                                              "key": key2, "ops": []}
        if "retune" not in meta2.get("ops", []):
            meta2["ops"] = (meta2.get("ops") or []) + ["retune"]
            _write_artifact_meta(path2, meta2)
        # audit trail on the OLD artifact: where its traffic went
        if meta.get("retuned_to") != key2:
            meta["retuned_to"] = key2
            try:
                _write_artifact_meta(meta["path"], dict(meta))
            except OSError:
                pass
    finally:
        fcntl.flock(lock_fd, fcntl.LOCK_UN)
        os.close(lock_fd)
    return {"retuned": True, "centroids": cents2,
            "lists": _stamp(lists2, meta2), "n_clusters": nlist2,
            "n_clusters_before": n_clusters, "n_vectors": n_vectors,
            "cap": cap}


def clear_cache() -> None:
    """Drop the process-local cache (tests)."""
    with _LOCK:
        _MEM.clear()
        _TUNED_MEMO.clear()


# ---------------------------------------------------------------------
# Product-quantization artifacts (codebooks + codes) — same lifecycle
# as the coarse quantizer/lists: train/encode at most once per
# (corpus fingerprint, hyperparameters), queries only read.
# ---------------------------------------------------------------------

_PQ_SCHEMA = "subspace long, c_label long, centroid array<double>"
_CODES_SCHEMA = "vec_id long, subspace long, code long"


def _pq_key(fingerprint: str, m: int, k: int, n_iter: int,
            sample_cap: int | None, round_to: int) -> str:
    return hashlib.md5(
        f"{fingerprint}|pq m={m}|k={k}|it={n_iter}|cap={sample_cap}"
        f"|rt={round_to}".encode()).hexdigest()


def pq_path(key: str, root: str | None = None) -> str:
    return os.path.join(root or artifact_root(), f"pq_{key}.json")


def pq_codes_path(key: str, root: str | None = None) -> str:
    return os.path.join(root or artifact_root(), f"pq_codes_{key}")


def get_or_train_pq(vectors: DataFrame, *, fingerprint: str,
                    m: int = 4, k: int = 8, dims: int = 64,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding", n_iter: int = 2,
                    sample_cap: int | None = 65536,
                    round_to: int = 6, root: str | None = None,
                    force: bool = False) -> DataFrame:
    """Per-subspace PQ codebooks (subspace, c_label, centroid),
    trained at most once per (fingerprint, hyperparameters) — the PQ
    half of the FAISS train() split. Queries carry a LocalTableScan
    of m*k rows; training (m seeded sampled-Lloyd runs) happens only
    on a cold artifact. JSON floats round-trip exactly (repr), so a
    loaded codebook scores bit-identically to a fresh one."""
    if dims % m:
        raise ValueError(f"get_or_train_pq: dims {dims} not divisible "
                         f"by m {m} — the trailing dims % m dimensions "
                         "would be silently dropped from training")
    key = _pq_key(fingerprint, m, k, n_iter, sample_cap, round_to)
    path = pq_path(key, root)
    spark = vectors.sparkSession
    if not force:
        with _LOCK:
            rows = _MEM.get("pq:" + key)
        if rows is None:
            try:
                with open(path) as f:
                    payload = json.load(f)
                rows = [(int(s), int(l), [float(x) for x in c])
                        for s, l, c in payload["codebooks"]]
            except (OSError, ValueError, KeyError):
                rows = None
        if rows is not None:
            mk = ("pqcb", spark.sparkContext.applicationId, key)
            with _LOCK:
                _MEM["pq:" + key] = rows
                df = _DF_MEMO.get(mk)
            if df is None:
                df = spark.createDataFrame(rows, _PQ_SCHEMA)
                with _LOCK:
                    _DF_MEMO[mk] = df
            return df
    from quasdb_spark.operators.similarity import _pq_subspace

    sub = dims // m
    rows = []
    for s in range(m):
        cents, _ = _pq_subspace(vectors, s, sub, k, id_col=id_col,
                                vec_col=vec_col, n_iter=n_iter,
                                sample_cap=sample_cap,
                                round_to=round_to)
        rows += [(s, r["c_label"], list(r["centroid"]))
                 for r in cents.collect()]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"meta": {"fingerprint": fingerprint, "m": m,
                                "k": k, "n_iter": n_iter,
                                "sample_cap": sample_cap,
                                "round_to": round_to},
                       "codebooks": [[s, l, list(map(float, c))]
                                     for s, l, c in rows]}, f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    df = spark.createDataFrame(rows, _PQ_SCHEMA)
    with _LOCK:
        _MEM["pq:" + key] = rows
        _DF_MEMO[("pqcb", spark.sparkContext.applicationId, key)] = df
    return df


def get_or_build_codes(vectors: DataFrame, codebooks: DataFrame, *,
                       fingerprint: str, m: int = 4, k: int = 8,
                       dims: int = 64, id_col: str = "vec_id",
                       vec_col: str = "embedding", n_iter: int = 2,
                       sample_cap: int | None = 65536,
                       round_to: int = 6, root: str | None = None,
                       force: bool = False) -> DataFrame:
    """Materialized PQ codes (vec_id, subspace, code) for (corpus,
    codebooks) — the add() half: one m-pass assignment written as
    parquet, read back by every query. This is the whole point of PQ
    at 100 TB: the corpus is stored as m*log2(k) bits per vector and
    the float embeddings never load at query time."""
    from quasdb_spark.operators.similarity import pq_assign

    key = _pq_key(fingerprint, m, k, n_iter, sample_cap, round_to)
    path = pq_codes_path(key, root)
    spark = vectors.sparkSession
    if force or not os.path.exists(os.path.join(path, "_SUCCESS")):
        (pq_assign(vectors, codebooks, m=m, dims=dims, id_col=id_col,
                   vec_col=vec_col)
         .write.mode("overwrite").parquet(path))
        _write_artifact_meta(path, {"fingerprint": fingerprint,
                                    "key": key, "ops": ["build"]})
    return _memo_read(spark, path, _CODES_SCHEMA, fingerprint, key)


_CODES_ARRAY_SCHEMA = "vec_id long, codes array<long>"


def pq_codes_array_path(key: str, root: str | None = None) -> str:
    return os.path.join(root or artifact_root(), f"pq_codesa_{key}")


def get_or_build_codes_array(vectors: DataFrame, codebooks: DataFrame, *,
                             fingerprint: str, m: int = 4, k: int = 8,
                             dims: int = 64, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_iter: int = 2,
                             sample_cap: int | None = 65536,
                             round_to: int = 6, root: str | None = None,
                             force: bool = False) -> DataFrame:
    """Materialized PQ codes in the ARRAY layout: ONE row per vector,
    (vec_id, codes array<long>) with codes[s] the subspace-s code —
    positional by construction (built from the row layout sorted by
    subspace; the write fails loudly if any vector doesn't carry
    exactly subspaces 0..m-1). This is the serving layout ivfpq_topk
    scores with inline m-lookup sums: m·log2(k) bits of payload per
    candidate row and NO per-(candidate, subspace) row amplification —
    at 100 TB the r9 row layout shipped and re-aggregated m× the
    candidate rows per query (VERDICT r9 #1)."""
    from pyspark.sql import functions as F

    from quasdb_spark.operators.similarity import pq_assign

    key = _pq_key(fingerprint, m, k, n_iter, sample_cap, round_to)
    path = pq_codes_array_path(key, root)
    spark = vectors.sparkSession
    if force or not os.path.exists(os.path.join(path, "_SUCCESS")):
        rows = pq_assign(vectors, codebooks, m=m, dims=dims,
                         id_col=id_col, vec_col=vec_col)
        pairs = F.sort_array(F.collect_list(F.struct("subspace", "code")))
        arr = rows.groupBy("vec_id").agg(
            F.transform(pairs, lambda x: x["code"]).alias("codes"),
            F.transform(pairs, lambda x: x["subspace"]).alias("_subs"))
        want = F.array(*[F.lit(s).cast("long") for s in range(m)])
        guard = F.assert_true(
            F.col("_subs") == want,
            F.format_string(
                "get_or_build_codes_array: vector %s encoded subspaces "
                "%s, expected 0.." + str(m - 1),
                F.col("vec_id"), F.col("_subs").cast("string")))
        (arr.select("vec_id",
                    F.when(guard.isNull(), F.col("codes")).alias("codes"))
         .write.mode("overwrite").parquet(path))
        _write_artifact_meta(path, {"fingerprint": fingerprint,
                                    "key": key, "ops": ["build"]})
    return _memo_read(spark, path, _CODES_ARRAY_SCHEMA, fingerprint, key)
