"""Plotting utilities (cf. `vbmc_plot.m`, `utils/cornerplot.m`,
`private/vbmc_iterplot.m`). Matplotlib is imported lazily so headless /
minimal environments only pay for it when plotting is requested."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax


def cornerplot(X: np.ndarray, names: Optional[Sequence[str]] = None,
               truths: Optional[np.ndarray] = None, fig=None, color="k"):
    """Pairwise-marginal corner plot of samples X (n, D)
    (cf. `utils/cornerplot.m`). Returns the matplotlib figure."""
    import matplotlib.pyplot as plt

    X = np.asarray(X)
    D = X.shape[1]
    if names is None:
        names = [f"x{i + 1}" for i in range(D)]
    if fig is None:
        fig, axes = plt.subplots(D, D, figsize=(2.2 * D, 2.2 * D),
                                 squeeze=False)
    else:
        axes = np.asarray(fig.axes).reshape(D, D)

    for i in range(D):
        for j in range(D):
            ax = axes[i][j]
            if j > i:
                ax.set_visible(False)
                continue
            if i == j:
                ax.hist(X[:, i], bins=40, density=True, color=color,
                        alpha=0.6, histtype="stepfilled")
                if truths is not None:
                    ax.axvline(truths[i], color="r", lw=1)
            else:
                ax.hist2d(X[:, j], X[:, i], bins=48, cmap="Greys")
                if truths is not None:
                    ax.plot(truths[j], truths[i], "r+", ms=10)
            if i == D - 1:
                ax.set_xlabel(names[j])
            else:
                ax.set_xticklabels([])
            if j == 0 and i > 0:
                ax.set_ylabel(names[i])
            else:
                ax.set_yticklabels([])
    fig.tight_layout()
    return fig


def vbmc_plot(vps, n_samples: int = 10 ** 5, names=None, truths=None,
              key=None):
    """Corner plot of one or more variational posteriors (cf. `vbmc_plot.m`).

    ``vps``: a VariationalPosterior, a VBMCResult, or a list of either.
    """
    from vbmc_tpu.vp import vp_rnd, is_valid_vp

    if key is None:
        key = jax.random.PRNGKey(0)
    if not isinstance(vps, (list, tuple)):
        vps = [vps]
    fig = None
    colors = ["k", "b", "g", "m", "c"]
    for i, v in enumerate(vps):
        vp = v if is_valid_vp(v) else v.vp
        key, k = jax.random.split(key)
        X = np.asarray(vp_rnd(vp, k, n_samples, orig_flag=True))
        fig = cornerplot(X, names=names, truths=truths, fig=fig,
                         color=colors[i % len(colors)])
    return fig


def plot_run(result, target_logpdf=None, bounds=None, n_grid: int = 80):
    """2-D contour + samples diagnostic of a completed run
    (cf. `private/vbmc_plot2d.m`)."""
    import matplotlib.pyplot as plt
    from vbmc_tpu.vp import vp_rnd, vp_pdf
    import jax.numpy as jnp

    vp = result.vp
    assert vp.D == 2, "plot_run supports 2-D problems"
    X = np.asarray(vp_rnd(vp, jax.random.PRNGKey(0), 20000, orig_flag=True))
    if bounds is None:
        lo, hi = X.min(0) - 0.5 * X.std(0), X.max(0) + 0.5 * X.std(0)
    else:
        lo, hi = bounds
    g1 = np.linspace(lo[0], hi[0], n_grid)
    g2 = np.linspace(lo[1], hi[1], n_grid)
    GX, GY = np.meshgrid(g1, g2)
    pts = np.stack([GX.ravel(), GY.ravel()], 1)
    P = np.asarray(vp_pdf(vp, jnp.asarray(pts), orig_flag=True)
                   ).reshape(n_grid, n_grid)

    fig, ax = plt.subplots(figsize=(6, 5))
    ax.contour(GX, GY, P, levels=10, cmap="viridis")
    Xtr = result.logger.X_orig[:result.logger.Xn]
    ax.plot(Xtr[:, 0], Xtr[:, 1], "k.", ms=3, alpha=0.5,
            label="evaluations")
    if target_logpdf is not None:
        T = np.asarray([target_logpdf(p) for p in pts]).reshape(n_grid,
                                                                n_grid)
        ax.contour(GX, GY, np.exp(T - T.max()), levels=6, cmap="Reds",
                   alpha=0.5)
    ax.set_title(f"ELBO = {result.elbo:.2f} ± {result.elbo_sd:.2f}")
    ax.legend()
    fig.tight_layout()
    return fig
