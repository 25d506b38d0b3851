"""Self-contained HTML desk report — the dashboard, as one artifact.

The reference ships a 13-page Streamlit dashboard (``streamlit_app/``);
its capability is visual + tabular exploration of a chain: smile fits,
the fitted surface, arbitrage diagnostics, risk numbers.  Here the same
content renders into ONE dependency-free HTML file (PNGs base64-inlined,
tables as plain HTML) so it works over scp/CI artifacts — no app server.

``build_report`` runs the full workflow: chain -> SVI slices + SSVI
(+ optional eSSVI) -> arbitrage report -> smile-fit and surface figures
-> VaR table -> optional exposure/XVA section, and writes the HTML.
"""
from __future__ import annotations

import base64
import datetime
import html
import io

import numpy as np

__all__ = ["build_report"]

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 2em auto; max-width: 1100px; color: #1a1a2e; }
h1 { border-bottom: 3px solid #16425b; padding-bottom: .3em; }
h2 { color: #16425b; margin-top: 1.6em; }
table { border-collapse: collapse; margin: .8em 0; font-size: 0.92em; }
th, td { border: 1px solid #c8d3dd; padding: .35em .7em; text-align: right; }
th { background: #e8eef3; }
td:first-child, th:first-child { text-align: left; }
img { max-width: 100%; border: 1px solid #dde5ec; margin: .5em 0; }
.ok { color: #1b7837; font-weight: 600; } .bad { color: #b2182b; font-weight: 600; }
.meta { color: #667; font-size: .85em; }
"""


def _fig_to_b64(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=100, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _img(fig) -> str:
    return f'<img src="data:image/png;base64,{_fig_to_b64(fig)}"/>'


def _table(rows, header=None) -> str:
    out = ["<table>"]
    if header:
        out.append("<tr>" + "".join(f"<th>{html.escape(str(h))}</th>"
                                    for h in header) + "</tr>")
    for r in rows:
        cells = []
        for c in r:
            if isinstance(c, float):
                c = f"{c:.6g}"
            cells.append(f"<td>{html.escape(str(c))}</td>")
        out.append("<tr>" + "".join(cells) + "</tr>")
    out.append("</table>")
    return "".join(out)


def _flag(ok: bool) -> str:
    return f'<span class="{"ok" if ok else "bad"}">{"PASS" if ok else "FAIL"}</span>'


def build_report(chain=None, *, out_path: str = "report.html",
                 n_expiry_bins: int = 4, n_steps: int = 400,
                 essvi: bool = True, include_boundary: bool = True,
                 include_xva: bool = True, n_rows: int = 500,
                 seed: int = 0) -> dict:
    """Run the chain workflow and write a self-contained HTML desk report.

    ``chain``: an ``OptionChainDataset``/DataFrame (default: the synthetic
    generator, so the command always has something to show).  Returns a
    summary dict (sections rendered, calibration RMSEs, output path).
    """
    from ..data.loader import load_option_data
    from ..surface.chain_calibration import calibrate_chain
    from . import plotting

    if chain is None:
        chain = load_option_data("synthetic", n_rows=n_rows, seed=seed)

    res = calibrate_chain(chain, n_expiry_bins=n_expiry_bins,
                          n_steps=n_steps, essvi=essvi)
    parts = [f"<style>{_CSS}</style>", "<h1>optionslab_tpu desk report</h1>",
             f'<p class="meta">generated {datetime.datetime.now():%Y-%m-%d %H:%M} · '
             f'spot {res.spot:.4g} · rate {res.rate:.4g} · '
             f'{int(np.sum(res.n_quotes))} quotes in {len(res.expiries)} '
             f'expiries</p>']
    summary = {"out_path": out_path, "sections": []}

    # --- calibration section ------------------------------------------
    parts.append("<h2>Smile calibration (SVI per expiry)</h2>")
    parts.append(_img(plotting.plot_smile_fits(chain, res)))
    rows = [(f"{t:.4f}", int(n), f"{rm * 100:.2f}",
             f"{th:.5f}", _flag(bf))
            for t, n, rm, th, bf in zip(res.expiries, res.n_quotes,
                                        res.svi_rmse_vol, res.thetas,
                                        res.report["butterfly_free"])]
    parts.append(_table(rows, header=["expiry (y)", "quotes",
                                      "rmse (vol pts)", "ATM total var",
                                      "butterfly-free"]))
    summary["sections"].append("smiles")

    parts.append("<h2>Surface (SSVI" + (" + eSSVI" if essvi else "") + ")</h2>")
    parts.append(_img(plotting.plot_ssvi_surface(res)))
    srows = [("SSVI (global rho/eta/gamma)", f"{res.ssvi_rmse_vol * 100:.2f}",
              _flag(bool(res.report["ssvi_butterfly_free"])))]
    if essvi and res.essvi is not None:
        srows.append(("eSSVI (per-expiry rho/psi)",
                      f"{res.essvi_rmse_vol * 100:.2f}",
                      _flag(bool(res.report.get("essvi_arbitrage_free",
                                                False)))))
    parts.append(_table(srows, header=["model", "rmse (vol pts)", "no-arb"]))
    summary["sections"].append("surface")

    parts.append("<h2>Static no-arbitrage report</h2>")
    rep_rows = [(k, (_flag(v) if isinstance(v, (bool, np.bool_)) else
                     f"{v:.6g}" if isinstance(v, float) else str(v)))
                for k, v in res.report.items()
                if not isinstance(v, (list, dict))]
    parts.append(_table(rep_rows, header=["check", "value"]))
    summary["sections"].append("arbitrage")

    # --- exercise boundary ---------------------------------------------
    if include_boundary:
        parts.append("<h2>American early-exercise boundary (LSM)</h2>")
        parts.append(_img(plotting.plot_exercise_boundary(
            spot=res.spot, strike=res.spot, rate=max(res.rate, 0.01),
            n_paths=20_000, n_dates=25, seed=seed)))
        summary["sections"].append("boundary")

    # --- risk ----------------------------------------------------------
    from ..risk import VaRAnalyzer

    a = VaRAnalyzer(confidence=0.95, seed=seed)
    try:
        df = chain.df if hasattr(chain, "df") else chain
        sigma_ref = float(np.median(np.asarray(df["implied_volatility"])))
        if not np.isfinite(sigma_ref) or sigma_ref <= 0:
            sigma_ref = 0.2
    except Exception:
        sigma_ref = 0.2
    notional = 1e6
    parts.append("<h2>Risk (95% one-year VaR on a 1M notional)</h2>")
    parts.append(_table([
        ("parametric", a.parametric(0.05, sigma_ref * notional)),
        ("lognormal", a.parametric_lognormal(notional, 0.05, sigma_ref)),
        ("monte carlo", a.monte_carlo(notional, 0.05, sigma_ref)),
    ], header=["method", "VaR"]))
    summary["sections"].append("risk")

    # --- XVA ------------------------------------------------------------
    if include_xva:
        from ..risk import Position, xva_report

        pos = Position(quantity=1.0, spot=res.spot, strike=res.spot,
                       maturity=1.0, rate=max(res.rate, 0.01),
                       vol=sigma_ref, option_type="call")
        xr = xva_report([pos], hazard_rate=0.02, n_dates=12, n_paths=16384,
                        seed=seed)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(7, 3.5))
            ax.plot(xr["dates"], xr["ee"], label="EE")
            ax.plot(xr["dates"], xr["pfe"],
                    label=f'PFE {xr["quantile"]:.0%}')
            ax.set_xlabel("time (y)")
            ax.set_ylabel("exposure")
            ax.set_title("counterparty exposure profile (ATM call)")
            ax.legend()
            fig.tight_layout()
            parts.append("<h2>Counterparty exposure & CVA</h2>")
            parts.append(_img(fig))
        except ImportError:  # pragma: no cover
            pass
        parts.append(_table([
            ("EPE", xr["epe"]), ("max PFE", xr["max_pfe"]),
            ("CVA (λ=2%, R=40%)", xr["cva"]),
        ], header=["metric", "value"]))
        summary["sections"].append("xva")

    with open(out_path, "w") as f:
        f.write("<!DOCTYPE html><html><head><meta charset='utf-8'>"
                "<title>optionslab_tpu report</title></head><body>"
                + "".join(parts) + "</body></html>")
    summary.update({
        "svi_rmse_vol": [float(x) for x in res.svi_rmse_vol],
        "ssvi_rmse_vol": float(res.ssvi_rmse_vol),
        "essvi_rmse_vol": (float(res.essvi_rmse_vol) if essvi else None),
        "arbitrage_free": bool(res.report["arbitrage_free"]),
    })
    return summary
