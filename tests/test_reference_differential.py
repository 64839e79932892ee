"""Differential testing against the REFERENCE implementation itself.

The reference's L2 UMI algorithms (per_umi_thresholding, umi_intersection;
/root/reference/nimble/utils.py) are pure pandas/numpy and import cleanly
here, so we run the reference code directly on randomized workloads and
require our exact pipeline to reproduce its count matrices bit-for-bit —
the strongest available oracle for BASELINE's count-exactness target.
"""
import sys
import types

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


def _load_reference_utils():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    # the reference imports `distro` (unused by the UMI code); stub if absent
    try:
        import distro  # noqa: F401
    except ImportError:
        sys.modules["distro"] = types.ModuleType("distro")
    try:
        from nimble.utils import per_umi_thresholding, umi_intersection

        return per_umi_thresholding, umi_intersection
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference utils unavailable: {e}")


import contextlib


@contextlib.contextmanager
def _pandas2_apply_compat():
    """pandas 3 excludes grouping columns from groupby.apply frames; the
    reference was written for pandas 1.5 where they were included. Re-attach
    the key columns inside apply so the reference code runs unchanged."""
    import pandas as pd
    from pandas.core.groupby.generic import DataFrameGroupBy

    orig_apply = DataFrameGroupBy.apply

    def compat_apply(self, func, *args, **kwargs):
        names = [n for n in self._grouper.names if n is not None]

        def with_keys(group, *a, **k):
            if isinstance(group, pd.DataFrame) and names:
                missing = [n for n in names if n not in group.columns]
                if missing:
                    key = group.name
                    if not isinstance(key, tuple):
                        key = (key,)
                    group = group.copy()
                    for n, v in zip(names, key):
                        group[n] = v
            return func(group, *a, **k)

        return orig_apply(self, with_keys, *args, **kwargs)

    DataFrameGroupBy.apply = compat_apply
    try:
        yield
    finally:
        DataFrameGroupBy.apply = orig_apply


def reference_report(rows, threshold):
    """The reference report() pipeline steps (reference: __main__.py:254-293)
    on (cb, umi, features, score) rows -> [(feature, count, cb)]."""
    import pandas as pd

    per_umi_thresholding, umi_intersection = _load_reference_utils()
    df = pd.DataFrame(rows, columns=["cb", "umi", "features", "nimble_score"])
    df = df[["features", "umi", "cb", "nimble_score"]].copy()
    df["features"] = df["features"].apply(lambda x: ",".join(sorted(x.split(","))))
    df = df.groupby(["cb", "umi", "features"])["nimble_score"].sum().reset_index()
    if threshold > 0:
        with _pandas2_apply_compat():
            df = per_umi_thresholding(df, threshold)
    else:
        df = df.copy()
        df["filtered_features"] = df["features"]
    df_grouped = umi_intersection(df)
    df_grouped = df_grouped[df_grouped["filtered_features"].apply(lambda x: len(x) > 0)]
    df_grouped = df_grouped.copy()
    df_grouped["filtered_features"] = df_grouped["filtered_features"].apply(
        lambda x: ",".join(x)
    )
    df_grouped.columns = ["cell_barcode", "umi", "feature"]
    df_counts = (
        df_grouped.groupby(["cell_barcode", "feature"]).size().reset_index(name="count")
    )
    return [
        (r["feature"], int(r["count"]), r["cell_barcode"])
        for _, r in df_counts.iterrows()
    ]


def our_report(rows, threshold):
    from nimble_tpu.quant.exact import report_rows

    counts, _ = report_rows(rows, threshold)
    return sorted(counts, key=lambda r: (r[2], r[0]))


def random_rows(rng, n_cells, n_umis, n_features, n_rows, score_kind="int"):
    feats = [f"feat{i:03d}" for i in range(n_features)]
    rows = []
    for _ in range(n_rows):
        cb = f"cell{rng.integers(0, n_cells):03d}"
        umi = f"UMI{rng.integers(0, n_umis):03d}"
        k = int(rng.integers(1, 5))
        chosen = rng.choice(n_features, size=k, replace=True)
        fstr = ",".join(feats[i] for i in chosen)
        if score_kind == "int":
            score = int(rng.integers(0, 200))
        elif score_kind == "float":
            score = float(np.round(rng.random() * 10, 3))
        else:
            score = float(rng.choice([0.1, 1 / 3, 2 / 3, 1e12, 25.0]))
        rows.append((cb, umi, fstr, score))
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("threshold", [0.0, 0.05, 0.2, 0.5])
def test_counts_bit_identical_int_scores(seed, threshold):
    rng = np.random.default_rng(seed)
    rows = random_rows(rng, 6, 20, 12, 400)
    assert our_report(rows, threshold) == sorted(
        reference_report(rows, threshold), key=lambda r: (r[2], r[0])
    )


@pytest.mark.parametrize("seed", [3, 4])
def test_counts_bit_identical_float_scores(seed):
    rng = np.random.default_rng(seed)
    rows = random_rows(rng, 4, 12, 8, 250, score_kind="float")
    assert our_report(rows, 0.05) == sorted(
        reference_report(rows, 0.05), key=lambda r: (r[2], r[0])
    )


def test_counts_bit_identical_adversarial_scores():
    # ratios exactly at thresholds, thirds, huge values
    rng = np.random.default_rng(9)
    rows = random_rows(rng, 3, 10, 6, 150, score_kind="mixed")
    assert our_report(rows, 1 / 3) == sorted(
        reference_report(rows, 1 / 3), key=lambda r: (r[2], r[0])
    )
