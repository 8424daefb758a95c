"""Z-order layout: every file covers a small hyper-rectangle, so a
two-column range predicate prunes most files from parquet footers
alone — the multi-column file-skipping claim in plans/zorder.py,
checked here against the actual written footer stats."""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from quasdb_spark.plans.zorder import interleave, scale_to_grid, zorder_write
from quasdb_spark.sources.tables import load_table


def _files_matching(path: str, lo_a, hi_a, lo_b, hi_b, col_a, col_b):
    """How many parquet files COULD contain rows in the rectangle,
    judged only by their footer min/max — what any engine's planner
    sees before reading data."""
    n = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = {}, {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if col.statistics is None:
                    continue
                s = col.statistics
                mins[name] = min(mins.get(name, s.min), s.min)
                maxs[name] = max(maxs.get(name, s.max), s.max)
        if (mins[col_a] <= hi_a and maxs[col_a] >= lo_a
                and mins[col_b] <= hi_b and maxs[col_b] >= lo_b):
            n += 1
    return n


def test_interleave_locality_and_bounds(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y"))
    z = df.select("x", "y", interleave([F.col("x"), F.col("y")], bits=4)
                  .alias("z")).collect()
    zs = {(r["x"], r["y"]): r["z"] for r in z}
    # bijective on the 16x16 grid, inside [0, 256)
    assert sorted(zs.values()) == list(range(256))
    # locality: neighbors on the grid are close on the curve on average
    import statistics
    d_neighbor = statistics.mean(
        abs(zs[(x, y)] - zs[(x + 1, y)]) for x in range(15) for y in range(16))
    d_random = statistics.mean(
        abs(zs[(x, y)] - zs[(15 - x, 15 - y)])
        for x in range(16) for y in range(16))
    assert d_neighbor < d_random / 4

    with pytest.raises(ValueError, match="exceeds a signed long"):
        interleave([F.col("x")] * 5, bits=16)


def test_scale_to_grid_edges(spark):
    df = spark.createDataFrame(
        [(None,), (-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)],
        "v double")
    got = [r["g"] for r in
           df.select(scale_to_grid(F.col("v"), 0.0, 100.0, 8).alias("g"))
             .collect()]
    assert got[0] == 0          # NULL -> 0
    assert got[1] == 0          # below lo clamps
    assert got[2] == 0
    assert got[3] == 127        # midpoint
    assert got[4] == 255        # hi
    assert got[5] == 255        # above hi clamps


def test_zorder_prunes_more_files_than_single_sort(spark, sf01_dir, tmp_path):
    # sf0.01: 10k events — enough rows that 64 files have meaningful
    # per-file stats (at sf0.001 a 15-row file's min/max is noise)
    ev = load_table(spark, sf01_dir, "events").select(
        "user_id", "event_id", "event_type", "value")
    n_files = 64

    # layout A: single-column sort (tight on user_id only)
    (ev.repartitionByRange(n_files, "user_id")
       .sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(str(tmp_path / "sorted")))
    # layout B: z-order on (user_id, event_id)
    zorder_write(ev, str(tmp_path / "zorder"),
                 by=["user_id", "event_id"], n_files=n_files)

    b = ev.agg(F.min("user_id"), F.max("user_id"),
               F.min("event_id"), F.max("event_id")).first()
    # a rectangle: 1/8 of users x 1/8 of event ids, placed in the
    # second quarter so it does not straddle the curve's top-level
    # split (a range crossing that boundary touches cells on both
    # halves — the known z-order boundary artifact; pruning still
    # happens, just less: measured 26/64 vs 20/64 here)
    ulo = b[0] + (b[1] - b[0]) * 5 // 16
    uhi = b[0] + (b[1] - b[0]) * 7 // 16
    elo = b[2] + (b[3] - b[2]) * 5 // 16
    ehi = b[2] + (b[3] - b[2]) * 7 // 16

    # (a) rectangle on BOTH dims: z-order prunes on both axes at once
    m_zorder = _files_matching(str(tmp_path / "zorder"),
                               ulo, uhi, elo, ehi, "user_id", "event_id")
    assert m_zorder <= n_files // 4, m_zorder

    # (b) the discriminating case — predicate on the SECOND column
    # only: the user_id-sorted layout can prune nothing (every file
    # spans the full event_id range), z-order still prunes
    m_sorted_e = _files_matching(str(tmp_path / "sorted"),
                                 b[0], b[1], elo, ehi,
                                 "user_id", "event_id")
    m_zorder_e = _files_matching(str(tmp_path / "zorder"),
                                 b[0], b[1], elo, ehi,
                                 "user_id", "event_id")
    # sorted layout: (near-)full scan — only incidental correlation
    # between the columns prunes anything; z-order reads under half
    # (measured 20/64 vs 64/64 at sf0.01)
    assert m_sorted_e >= n_files - 6, m_sorted_e
    assert m_zorder_e <= n_files // 2, (m_zorder_e, m_sorted_e)

    # correctness: both layouts answer the rectangle query identically
    pred = (F.col("user_id").between(ulo, uhi)
            & F.col("event_id").between(elo, ehi))
    n_a = spark.read.parquet(str(tmp_path / "sorted")).where(pred).count()
    n_z = spark.read.parquet(str(tmp_path / "zorder")).where(pred).count()
    assert n_a == n_z == ev.where(pred).count()

    # and the predicate reaches the scan
    plan = (spark.read.parquet(str(tmp_path / "zorder")).where(pred)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "user_id" in plan
