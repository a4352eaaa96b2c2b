"""Per-group OLS regression via distributed sufficient statistics.

Spark-native re-expression of the reference's regby module
(reference: pd_utils/regby.py). The reference splits the frame into
per-group numpy arrays and fans them out to a multiprocessing Pool
(pd_utils/regby.py:78-127). Here the row-level work is pure JVM
aggregation: each group's normal-equation moments (X'X, X'y, n) are
computed with map-side partial aggregation, so the shuffle carries
k*(k+3)/2 + 1 doubles per group instead of every row, and Python only
ever sees ONE ROW PER GROUP — the tiny moment vectors, solved in
batched numpy (stacked pinv) inside ``mapInPandas``. HC1 robust
standard errors take a second moment pass (residual sandwich) with
the same shape. This scales to arbitrarily large groups with constant
per-group shuffle volume — the 100 TB posture for UDAF-shaped ops.

The solve matches ``np.linalg.lstsq`` / statsmodels OLS: for
full-rank groups pinv(X'X) X'y is the exact normal-equation solution;
for rank-deficient groups both give the minimum-norm solution.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def _moment_aggs(rhs: list, yvar: str) -> list:
    """sum(x_i * x_j) for i<=j, sum(x_i * y), count — the normal
    equations' sufficient statistics. ``rhs`` entries are column names
    or the literal 1 for the intercept."""

    def c(t):
        return F.lit(1.0) if t == "const" else F.col(t).cast("double")

    aggs = [F.count(F.lit(1)).alias("__n__")]
    k = len(rhs)
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(c(rhs[i]) * c(rhs[j])).alias(f"__xx_{i}_{j}__"))
    for i in range(k):
        aggs.append(F.sum(c(rhs[i]) * F.col(yvar).cast("double")).alias(f"__xy_{i}__"))
    return aggs


def _stack_xtx(pdf: pd.DataFrame, k: int) -> np.ndarray:
    xtx = np.empty((len(pdf), k, k))
    for i in range(k):
        for j in range(i, k):
            v = pdf[f"__xx_{i}_{j}__"].to_numpy(dtype=float)
            xtx[:, i, j] = v
            xtx[:, j, i] = v
    return xtx


def reg_by(
    df: DataFrame,
    yvar: str,
    xvars: Union[str, list[str]],
    groupvar: Union[str, list[str]],
    merge: bool = False,
    cons: bool = True,
    mp: Union[bool, int] = False,
    stderr: bool = False,
) -> DataFrame:
    """Regress ``yvar`` on ``xvars`` within each ``groupvar`` group
    (reference: pd_utils/regby.py:14-61).

    Output: one row per group with ``coef_<x>`` columns (plus ``const``
    when ``cons``), optionally ``stderr_*`` HC1 robust standard errors,
    and the group key (string, like the reference's concatenated key,
    pd_utils/regby.py:183-192). Rows with any null in y/x/group are
    dropped; groups with fewer than ``len(xvars)+1(+1 with cons)``
    observations yield NaN coefficients (pd_utils/regby.py:160).

    ``merge=True`` left-joins the coefficients back onto the input rows.
    ``mp`` is accepted for API parity and ignored (executor parallelism
    replaces the reference Pool).
    """
    xvars_l = to_list(xvars)
    groupvar_l = to_list(groupvar)

    multi_group = len(groupvar_l) > 1
    if multi_group:
        key_col = "__key_regby__"
        keyed = df.withColumn(
            key_col, F.concat(*[F.col(c).cast("string") for c in groupvar_l])
        )
    else:
        key_col = groupvar_l[0]
        keyed = df

    rhs = (["const"] if cons else []) + xvars_l
    k = len(rhs)
    coef_cols = [("const" if r == "const" else f"coef_{r}") for r in rhs]
    out_cols = coef_cols + [key_col]
    if stderr:
        out_cols += [f"stderr_{r}" for r in rhs]
    min_obs = len(xvars_l) + 1 + (1 if cons else 0)

    data = (
        keyed.select(
            F.col(key_col).cast("string").alias(key_col), yvar, *xvars_l
        )
        .na.drop()
    )

    # ---- pass 1: normal-equation moments (JVM, partial aggregation)
    stats = data.groupBy(key_col).agg(*_moment_aggs(rhs, yvar))

    coef_schema = ",".join(
        [f"`{key_col}` string"] + [f"`{c}` double" for c in coef_cols]
    )

    def solve_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            with np.errstate(invalid="ignore", divide="ignore"):
                if k == 2:
                    # explicit Cramer solve — the same arithmetic an ANSI
                    # SQL oracle writes, so results agree to the last ulp
                    n = pdf["__xx_0_0__"].to_numpy(dtype=float)
                    sx = pdf["__xx_0_1__"].to_numpy(dtype=float)
                    sxx = pdf["__xx_1_1__"].to_numpy(dtype=float)
                    sy = pdf["__xy_0__"].to_numpy(dtype=float)
                    sxy = pdf["__xy_1__"].to_numpy(dtype=float)
                    det = n * sxx - sx * sx
                    beta = np.stack(
                        [(sxx * sy - sx * sxy) / det, (n * sxy - sx * sy) / det],
                        axis=1,
                    )
                elif k == 3:
                    # explicit 3x3 Cramer cofactor expansion, same term
                    # ordering an ANSI SQL oracle writes (symmetric
                    # A=[[a,b,c],[b,d,e],[c,e,f]], rhs=(p,q,r))
                    a = pdf["__xx_0_0__"].to_numpy(dtype=float)
                    b = pdf["__xx_0_1__"].to_numpy(dtype=float)
                    c = pdf["__xx_0_2__"].to_numpy(dtype=float)
                    d = pdf["__xx_1_1__"].to_numpy(dtype=float)
                    e = pdf["__xx_1_2__"].to_numpy(dtype=float)
                    f = pdf["__xx_2_2__"].to_numpy(dtype=float)
                    p = pdf["__xy_0__"].to_numpy(dtype=float)
                    q = pdf["__xy_1__"].to_numpy(dtype=float)
                    r = pdf["__xy_2__"].to_numpy(dtype=float)
                    det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
                    b0 = (p * (d * f - e * e) - b * (q * f - e * r) + c * (q * e - d * r)) / det
                    b1 = (a * (q * f - e * r) - p * (b * f - e * c) + c * (b * r - q * c)) / det
                    b2 = (a * (d * r - q * e) - b * (b * r - q * c) + p * (b * e - d * c)) / det
                    beta = np.stack([b0, b1, b2], axis=1)
                elif k == 1:
                    beta = (
                        pdf["__xy_0__"].to_numpy(dtype=float)
                        / pdf["__xx_0_0__"].to_numpy(dtype=float)
                    )[:, None]
                else:
                    xtx = _stack_xtx(pdf, k)
                    xty = np.stack(
                        [pdf[f"__xy_{i}__"].to_numpy(dtype=float) for i in range(k)],
                        axis=1,
                    )
                    beta = np.einsum("nij,nj->ni", np.linalg.pinv(xtx), xty)
            low = pdf["__n__"].to_numpy() < min_obs
            beta[low, :] = np.nan
            out = {key_col: pdf[key_col]}
            for i, c in enumerate(coef_cols):
                out[c] = beta[:, i]
            yield pd.DataFrame(out)

    betas = stats.mapInPandas(solve_batch, coef_schema)

    if not stderr:
        result = betas.select(*out_cols)
    else:
        # ---- pass 2: residual sandwich meat sum(e^2 x_i x_j) per group
        joined = data.join(betas, on=key_col, how="inner")
        xb = None
        for r, c in zip(rhs, coef_cols):
            term = F.col(c) * (F.lit(1.0) if r == "const" else F.col(r).cast("double"))
            xb = term if xb is None else xb + term
        e2 = (F.col(yvar).cast("double") - xb) ** 2

        def cx(t):
            return F.lit(1.0) if t == "const" else F.col(t).cast("double")

        meat_aggs = []
        for i in range(k):
            for j in range(i, k):
                meat_aggs.append(
                    F.sum(e2 * cx(rhs[i]) * cx(rhs[j])).alias(f"__mt_{i}_{j}__")
                )
        meat = joined.groupBy(key_col).agg(*meat_aggs)
        full = stats.join(meat, on=key_col, how="left")

        se_schema = ",".join(
            [f"`{key_col}` string"] + [f"`stderr_{r}` double" for r in rhs]
        )

        def sandwich_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                n = pdf["__n__"].to_numpy(dtype=float)
                with np.errstate(invalid="ignore", divide="ignore"):
                    scale = np.where(n > k, n / (n - k), np.nan)
                    if k == 2:
                        # explicit 2x2 sandwich, oracle-matched term order
                        nn = pdf["__xx_0_0__"].to_numpy(dtype=float)
                        sx = pdf["__xx_0_1__"].to_numpy(dtype=float)
                        sxx = pdf["__xx_1_1__"].to_numpy(dtype=float)
                        m00 = pdf["__mt_0_0__"].to_numpy(dtype=float)
                        m01 = pdf["__mt_0_1__"].to_numpy(dtype=float)
                        m11 = pdf["__mt_1_1__"].to_numpy(dtype=float)
                        det = nn * sxx - sx * sx
                        cov00 = (sxx * sxx * m00 - 2 * sxx * sx * m01 + sx * sx * m11) / (det * det)
                        cov11 = (sx * sx * m00 - 2 * nn * sx * m01 + nn * nn * m11) / (det * det)
                        diag = np.stack([cov00, cov11], axis=1)
                    elif k == 1:
                        sxx = pdf["__xx_0_0__"].to_numpy(dtype=float)
                        m00 = pdf["__mt_0_0__"].to_numpy(dtype=float)
                        diag = (m00 / (sxx * sxx))[:, None]
                    else:
                        xtx_inv = np.linalg.pinv(_stack_xtx(pdf, k))
                        mt = np.empty((len(pdf), k, k))
                        for i in range(k):
                            for j in range(i, k):
                                v = pdf[f"__mt_{i}_{j}__"].to_numpy(dtype=float)
                                mt[:, i, j] = v
                                mt[:, j, i] = v
                        cov = np.einsum("nij,njl,nlm->nim", xtx_inv, mt, xtx_inv)
                        diag = np.diagonal(cov, axis1=1, axis2=2)
                    se = np.sqrt(diag * scale[:, None])
                se[n < min_obs, :] = np.nan
                out = {key_col: pdf[key_col]}
                for i, r in enumerate(rhs):
                    out[f"stderr_{r}"] = se[:, i]
                yield pd.DataFrame(out)

        ses = full.mapInPandas(sandwich_batch, se_schema)
        result = betas.join(ses, on=key_col, how="left").select(*out_cols)

    if merge:
        merged = keyed.join(result, on=key_col, how="left")
        if multi_group:
            merged = merged.drop(key_col)
        return merged
    return result
