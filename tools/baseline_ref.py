#!/usr/bin/env python3
"""Empirical BASELINE for the reference's pipeline shapes (BASELINE.md:29-33).

The reference (qafs v0.1.1) publishes no numbers and cannot run here (its
backend imports dask/sqlalchemy, absent in this container). Its compute is
pandas semantics anyway — `Backend.load` does `ddf.compute()` and then pure
pandas (groupby().last(), merge+ffill; /root/reference/src/qafs/backend/
pandas.py:148-177) — so this script times the SAME operation sequence in
pure pandas+pyarrow on the SAME fixture data the Spark bench uses
(events @ sf dir, tripled to 3 versions like graft.Fixtures). If anything
this favors the reference: no dask scheduler or partition overhead.

Ops timed (SURVEY §2 ids, reference file:line):
  save_df  S1     partition-derive + partitioned parquet append   pandas.py:226-268
  load     S2+A1  filtered read + latest-version dedup            pandas.py:97-161
  load_range F1   ditto with time-range filters                   pandas.py:101-109
  resample R1     dedup + grid spine merge + ffill + right-join   pandas.py:163-172
  align    R2     two features outer-concat + ffill               timeseries.py:12-14
  transform T2    DAG eval click + click^2 over aligned load      core.py:453-600

Usage: python3 tools/baseline_ref.py /root/testdata/sf0.1 [iters]
       python3 tools/baseline_ref.py --synthetic N [iters]
The --synthetic mode mirrors graft.ScaleSmoke's 20M-row series (same
timestamps, 3 versions, same null mask for ffill) to locate the scale
crossover between single-process pandas and the Spark engine.
Prints one JSON line; paste numbers into BASELINE.md.
"""
import json, shutil, sys, tempfile, time

import numpy as np
import pandas as pd


def synthetic(n, iters):
    """ScaleSmoke's series in pandas: ingest, load+dedup, month read, ffill."""
    i = np.arange(n)
    df = pd.DataFrame({
        "time": pd.to_datetime(1609459200000000 + (i // 3) * 9467280, unit="us"),
        "value": np.random.RandomState(42).rand(n) * 100 * (i % 3 + 1),
        "created_time": pd.to_datetime(
            1609459200000000 + (i // 3) * 9467280 - (i % 3) * 1000000, unit="us"),
    })
    tmp = tempfile.mkdtemp(prefix="baseline_scale_")
    path = f"{tmp}/f"
    results = {}

    def run(name, fn, reset=False):
        times = []
        for _ in range(iters):
            if reset:
                shutil.rmtree(path, ignore_errors=True)
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
            print(f"[baseline] {name:<28} {times[-1]:8.2f} s", file=sys.stderr)
        results[name] = min(times)

    def save():
        out = df.copy()
        out["partition"] = out["time"].dt.strftime("%Y-%m-%d")
        out.to_parquet(path, engine="pyarrow", compression="snappy",
                       partition_cols=["partition"], index=False)

    run("ingest", save, reset=True)
    run("load_dedup", lambda: load_shape(path))
    run("month_read", lambda: load_shape(path, "2021-06-01", "2021-06-30 23:59:59"))

    def ffill():
        pdf = load_shape(path)
        # ScaleSmoke's null mask: keep value only where micros(time) % 7 < 3
        micros = pdf.index.view("int64") // 1000
        pdf["value"] = pdf["value"].where(micros % 7 < 3)
        return pdf["value"].ffill()

    run("ffill", ffill)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"engine": "pandas-ref-shape", "synthetic_rows": n,
                      "iters": iters, "ops_sec": results}))


def load_shape(path, from_date=None, to_date=None):
    """Reference Backend._read + load dedup: filtered parquet read,
    drop partition, groupby(time).last() keeping max created_time."""
    filters = []
    if from_date is not None:
        filters.append(("time", ">=", pd.Timestamp(from_date)))
    if to_date is not None:
        filters.append(("time", "<=", pd.Timestamp(to_date)))
    pdf = pd.read_parquet(path, engine="pyarrow", filters=filters or None)
    # pandas.py:161 — keep only last created_time per time
    return pdf.set_index("created_time").sort_index().groupby("time").last()


def main(sf, iters):
    ev = pd.read_parquet(f"{sf}/events.parquet")

    # graft.Fixtures tripled-version frame for one event_type
    def tripled(et):
        base = ev[ev.event_type == et][["ts", "value"]].rename(columns={"ts": "time"})
        parts = []
        for v in range(3):
            p = base.copy()
            p["value"] = p["value"] * (v + 1)
            p["created_time"] = p["time"] - pd.Timedelta(minutes=v)
            parts.append(p)
        return pd.concat(parts, ignore_index=True)

    click, purchase = tripled("click"), tripled("purchase")
    tmp = tempfile.mkdtemp(prefix="baseline_ref_")
    paths = {"click": f"{tmp}/click", "purchase": f"{tmp}/purchase"}

    def save_df(df, path):
        # pandas.py:66-91 — derive partition column, partitioned append write
        out = df.copy()
        out["partition"] = out["time"].dt.strftime("%Y-%m-%d")
        out.to_parquet(path, engine="pyarrow", compression="snappy",
                       partition_cols=["partition"], index=False)

    ops = {
        "save_df": lambda: (save_df(click, paths["click"]),
                            save_df(purchase, paths["purchase"])),
        "load": lambda: load_shape(paths["click"]),
        "load_range": lambda: load_shape(paths["click"],
                                         "2024-01-10", "2024-01-20"),
        "resample_2h": lambda: resample(paths["click"]),
        "align_ffill": lambda: align(paths["click"], paths["purchase"]),
        "transform_dag": lambda: transform(paths["click"]),
    }

    def resample(path):
        # pandas.py:163-172 — spine merge + ffill + right join
        pdf = load_shape(path, "2024-01-01", "2024-01-08")
        samples = pd.DataFrame(index=pd.date_range("2024-01-01", "2024-01-08",
                                                   freq="2h"))
        return pd.merge(
            pd.merge(pdf, samples, left_index=True, right_index=True,
                     how="outer").ffill(),
            samples, left_index=True, right_index=True, how="right")

    def align(pa_, pb):
        # timeseries.py:12-14 — outer concat on time axis + ffill
        a = load_shape(pa_)[["value"]].rename(columns={"value": "click"})
        b = load_shape(pb)[["value"]].rename(columns={"value": "purchase"})
        return pd.concat([a, b], join="outer", axis=1).ffill()

    def transform(path):
        # click_comb = click + click^2 (the fixture's T2 DAG) over a
        # range-filtered load, like fs_transform_dag
        pdf = load_shape(path, "2024-01-05", "2024-01-15")
        sq = pdf["value"] * pdf["value"]
        return pdf.assign(click_comb=pdf["value"] + sq)[["click_comb"]]

    results = {}
    for name, fn in ops.items():
        times = []
        for _ in range(iters):
            if name == "save_df":  # append-write: reset target for each run
                for p in paths.values():
                    shutil.rmtree(p, ignore_errors=True)
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
            print(f"[baseline] {name:<14} {times[-1]:8.3f} s", file=sys.stderr)
        results[name] = min(times)

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"engine": "pandas-ref-shape", "sf": sf,
                      "iters": iters, "ops_sec": results}))


if __name__ == "__main__":
    if sys.argv[1] == "--synthetic":
        synthetic(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 2)
    else:
        main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3)
