"""Algebraic partials for the Pearson correlation matrix and PCA.

Replaces the reference's sampled ``df[num_cols].corr()`` heatmap
(Profiler.py:1019-1028) and PCA feature importance (Profiler.py:1033-1065)
with exact streaming Gram-matrix partials: per batch accumulate
(n, sum_x, sum_xx) with pairwise-complete NaN handling disabled — rows with
any NaN in the numeric block are mean-imputed at finalize like the
reference's ``SimpleImputer(strategy='mean')``.

To keep the merge purely additive we accumulate raw cross-products per
batch (numerically fine at float64 for profile purposes) and NaNs are
replaced per-batch by 0 with a parallel indicator so column means are
computed over observed values only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class CorrState:
    columns: list = field(default_factory=list)
    n: int = 0                      # total rows
    obs: np.ndarray | None = None   # per-column observed (non-NaN) count
    s1: np.ndarray | None = None    # per-column sum of observed values
    # cross-products over the 0-imputed matrix + indicator cross-counts
    xtx: np.ndarray | None = None   # X0.T @ X0  (X0 = x with NaN→0)
    mtm: np.ndarray | None = None   # M.T @ M    (M = observed indicator)
    xtm: np.ndarray | None = None   # X0.T @ M

    @classmethod
    def from_matrix(cls, x: np.ndarray, columns: list) -> "CorrState":
        """x: (rows, cols) float64 with NaN for missing."""
        st = cls(columns=list(columns))
        m = (~np.isnan(x)).astype(np.float64)
        x0 = np.nan_to_num(x, nan=0.0)
        st.n = x.shape[0]
        st.obs = m.sum(axis=0)
        st.s1 = x0.sum(axis=0)
        st.xtx = x0.T @ x0
        st.mtm = m.T @ m
        st.xtm = x0.T @ m
        return st

    def merge(self, o: "CorrState") -> "CorrState":
        if o.n == 0 or o.obs is None:
            return self
        if self.n == 0 or self.obs is None:
            return o
        out = CorrState(columns=self.columns)
        out.n = self.n + o.n
        out.obs = self.obs + o.obs
        out.s1 = self.s1 + o.s1
        out.xtx = self.xtx + o.xtx
        out.mtm = self.mtm + o.mtm
        out.xtm = self.xtm + o.xtm
        return out

    def corr_matrix(self) -> np.ndarray:
        """Pearson correlation after mean imputation of missing values.

        With NaNs imputed to the column mean mu_j, for the imputed matrix Y:
          sum(y_i y_j) = xtx_ij + mu_j*(xtm_ij... )  — expanded below.
        """
        mu = self.s1 / np.maximum(self.obs, 1)           # observed means
        n = self.n
        # Y = X0 + (1-M) * mu  (outer broadcast); derive Y.T @ Y additively:
        # YtY_ij = xtx_ij + mu_j*(s1_i - xtm_ij) + mu_i*(s1_j - xtm_ji)
        #          + mu_i*mu_j*(n - obs_i - obs_j + mtm_ij)
        s1 = self.s1
        xtm = self.xtm
        yty = (
            self.xtx
            + mu[None, :] * (s1[:, None] - xtm)
            + mu[:, None] * (s1[None, :] - xtm.T)
            + np.outer(mu, mu) * (n - self.obs[:, None] - self.obs[None, :] + self.mtm)
        )
        # column means of Y are exactly mu (imputation preserves means)
        cov = yty / n - np.outer(mu, mu)
        sd = np.sqrt(np.clip(np.diag(cov), 0, None))
        denom = np.outer(sd, sd)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.where(denom > 0, cov / denom, np.nan)
        return corr

    def pca_importance(self, n_components: int = 10) -> dict:
        """PCA on the correlation matrix (== PCA of standardized, imputed
        data, matching the reference's StandardScaler+PCA); importance =
        sum of |loadings| per feature over the kept components
        (Profiler.py:1056-1057)."""
        corr = self.corr_matrix()
        valid = ~np.isnan(np.diag(corr))
        cols = [c for c, v in zip(self.columns, valid) if v]
        sub = corr[np.ix_(valid, valid)]
        if sub.shape[0] == 0:
            return {}
        vals, vecs = np.linalg.eigh(np.nan_to_num(sub, nan=0.0))
        order = np.argsort(vals)[::-1][: min(n_components, sub.shape[0])]
        comps = vecs[:, order]
        importance = np.abs(comps).sum(axis=1)
        return dict(zip(cols, importance.tolist()))
