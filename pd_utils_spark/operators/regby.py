"""Per-group OLS regression via grouped-map pandas UDF.

Spark-native re-expression of the reference's regby module
(reference: pd_utils/regby.py). The reference splits the frame into
per-group numpy arrays and fans them out to a multiprocessing Pool
(pd_utils/regby.py:78-127); here ``groupBy(groupvar).applyInPandas``
does the same fan-out across executors with Arrow-batched transfer —
this IS the Spark-native replacement for that machinery.

The OLS kernel is closed-form numpy (lstsq + HC1 sandwich), no
statsmodels dependency.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def _ols(y: np.ndarray, X: np.ndarray, stderr: bool):
    """OLS coefficients and (optionally) HC1 robust standard errors,
    matching statsmodels ``OLS(y, X).fit()`` params / ``HC1_se``
    (reference kernel: pd_utils/regby.py:150-172)."""
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    if not stderr:
        return beta, None
    n, k = X.shape
    resid = y - X @ beta
    xtx_inv = np.linalg.pinv(X.T @ X)
    meat = (X * (resid**2)[:, None]).T @ X
    cov = xtx_inv @ meat @ xtx_inv * (n / (n - k))
    se = np.sqrt(np.diag(cov))
    return beta, se


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
    and the group key. Multiple groupvars are concatenated into a single
    string ``key`` internally, like the reference
    (pd_utils/regby.py:183-192). Rows with any null in y/x/group are
    dropped; groups with fewer than ``len(xvars)+1(+1 with cons)``
    observations yield null coefficients (pd_utils/regby.py:160).

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
    coef_cols = [("const" if r == "const" else f"coef_{r}") for r in rhs]
    out_cols = coef_cols + [key_col]
    if stderr:
        out_cols += [f"stderr_{r}" for r in rhs]
    schema = ",".join(
        [f"`{c}` double" for c in coef_cols]
        + [f"`{key_col}` string"]
        + ([f"`stderr_{r}` double" for r in rhs] if stderr else [])
    )

    data = keyed.select(key_col, yvar, *xvars_l).na.drop()

    n_x = len(xvars_l)
    min_obs = n_x + 1 + (1 if cons else 0)
    use_cons = cons
    use_stderr = stderr

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf[key_col].iloc[0])
        X = pdf[xvars_l].to_numpy(dtype=float)
        if use_cons:
            X = np.column_stack([np.ones(len(X)), X])
        y = pdf[yvar].to_numpy(dtype=float)
        row: dict = {}
        if len(pdf) >= min_obs:
            beta, se = _ols(y, X, use_stderr)
            for i, c in enumerate(coef_cols):
                row[c] = float(beta[i])
            if use_stderr:
                for i, r in enumerate(rhs):
                    row[f"stderr_{r}"] = float(se[i])
        else:
            for c in coef_cols:
                row[c] = float("nan")
            if use_stderr:
                for r in rhs:
                    row[f"stderr_{r}"] = float("nan")
        row[key_col] = key
        return pd.DataFrame([row])

    result = data.groupBy(key_col).applyInPandas(fit_group, schema=schema)
    result = result.select(*out_cols)

    if merge:
        merged = keyed.join(result, on=key_col, how="left")
        if multi_group:
            merged = merged.drop(key_col)
        return merged
    return result
