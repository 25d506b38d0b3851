"""Option-chain loading, standardization, filtering, and model-input prep.

Reference capabilities covered (SURVEY.md §2.8, ``src/data/data_loader.py``):
  - ``OptionChainDataset``: column standardization across vendor formats
    (``:48,509-531``), liquidity & moneyness filters (``:112,142``),
    IV-from-price backfill (``:162-240``), log-moneyness (``:241``),
    ``to_model_input`` → the 7-feature frame (``:276``)
  - loaders: csv / parquet / synthetic / yfinance (``:302-507``)
  - ``load_option_data`` convenience (``:548``)

TPU-first: the IV backfill inverts the ENTIRE chain in one vectorized
Newton launch (``models.iv.implied_vol``) instead of a per-row loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..models.iv import implied_vol
from ..surface.features import engineer_features
from ..utils.config import YFINANCE_AVAILABLE
from ..utils.exceptions import DataError, DependencyError
from ..utils.validation import check_required_columns

# vendor column name → canonical name
COLUMN_ALIASES = {
    "spot": "underlying_price",
    "underlying": "underlying_price",
    "underlyingprice": "underlying_price",
    "stock_price": "underlying_price",
    "s": "underlying_price",
    "strike": "strike_price",
    "k": "strike_price",
    "ttm": "time_to_maturity",
    "maturity": "time_to_maturity",
    "t": "time_to_maturity",
    "tau": "time_to_maturity",
    "rate": "risk_free_rate",
    "r": "risk_free_rate",
    "iv": "implied_volatility",
    "impliedvolatility": "implied_volatility",
    "impl_volatility": "implied_volatility",
    "vol": "implied_volatility",
    "hist_vol": "historical_volatility",
    "hv": "historical_volatility",
    "type": "option_type",
    "cp_flag": "option_type",
    "right": "option_type",
    "price": "option_price",
    "mid": "option_price",
    "lastprice": "option_price",
    "volume": "volume",
    "openinterest": "open_interest",
    "open_int": "open_interest",
}

REQUIRED = ["underlying_price", "strike_price", "time_to_maturity", "risk_free_rate"]


def standardize_columns(df):
    """Lower/snake-case names, map vendor aliases to canonical columns."""
    out = df.copy()
    renames = {}
    for col in out.columns:
        key = str(col).strip().lower().replace(" ", "_")
        renames[col] = COLUMN_ALIASES.get(key, COLUMN_ALIASES.get(key.replace("_", ""), key))
    out = out.rename(columns=renames)
    if "option_type" in out.columns:
        out["option_type"] = (
            out["option_type"].astype(str).str.lower().str[0].map({"c": "call", "p": "put"})
        )
    return out


@dataclasses.dataclass
class OptionChainDataset:
    """A standardized chain with filter / backfill / feature-prep methods."""

    df: "object"  # pandas DataFrame

    def __post_init__(self):
        self.df = standardize_columns(self.df)
        check_required_columns(self.df, REQUIRED)

    def __len__(self):
        return len(self.df)

    # -- filters (reference: data_loader.py:112,142) ------------------------
    def filter_liquidity(self, min_volume: int = 0, min_open_interest: int = 0,
                         max_spread_pct: Optional[float] = None) -> "OptionChainDataset":
        df = self.df
        if min_volume and "volume" in df.columns:
            df = df[df["volume"] >= min_volume]
        if min_open_interest and "open_interest" in df.columns:
            df = df[df["open_interest"] >= min_open_interest]
        if max_spread_pct is not None and {"bid", "ask"} <= set(df.columns):
            mid = (df["bid"] + df["ask"]) / 2
            spread = (df["ask"] - df["bid"]) / mid.clip(lower=1e-12)
            df = df[spread <= max_spread_pct]
        return OptionChainDataset(df.reset_index(drop=True))

    def filter_moneyness(self, lo: float = 0.7, hi: float = 1.3) -> "OptionChainDataset":
        m = self.df["underlying_price"] / self.df["strike_price"]
        return OptionChainDataset(self.df[(m >= lo) & (m <= hi)].reset_index(drop=True))

    def filter_maturity(self, min_ttm: float = 0.01, max_ttm: float = 3.0) -> "OptionChainDataset":
        t = self.df["time_to_maturity"]
        return OptionChainDataset(self.df[(t >= min_ttm) & (t <= max_ttm)].reset_index(drop=True))

    # -- enrichment ---------------------------------------------------------
    def backfill_implied_vol(self, drop_failed: bool = True) -> "OptionChainDataset":
        """Invert option_price → implied_volatility for rows missing IV —
        the whole chain in ONE vectorized Newton launch
        (reference loops inline Newton per row, ``data_loader.py:162-240``)."""
        df = self.df.copy()
        if "option_price" not in df.columns:
            raise DataError("backfill_implied_vol needs an option_price column")
        need = df["implied_volatility"].isna() if "implied_volatility" in df.columns \
            else np.ones(len(df), dtype=bool)
        if need.any():
            sub = df[need]
            cp = np.where(sub.get("option_type", "call").astype(str).str.startswith("c"), 1.0, -1.0)
            iv = np.asarray(implied_vol(
                sub["option_price"].to_numpy(np.float64),
                sub["underlying_price"].to_numpy(np.float64),
                sub["strike_price"].to_numpy(np.float64),
                sub["time_to_maturity"].to_numpy(np.float64),
                sub["risk_free_rate"].to_numpy(np.float64),
                cp,
                sub.get("dividend_yield", 0.0),
            ))
            if "implied_volatility" not in df.columns:
                df["implied_volatility"] = np.nan
            df.loc[need, "implied_volatility"] = iv
        if drop_failed:
            df = df[np.isfinite(df["implied_volatility"])]
        return OptionChainDataset(df.reset_index(drop=True))

    def with_log_moneyness(self) -> "OptionChainDataset":
        df = self.df.copy()
        df["log_moneyness"] = np.log(df["underlying_price"] / df["strike_price"])
        return OptionChainDataset(df)

    def to_model_input(self):
        """The 7-feature frame for the surface models (``:276``)."""
        df = self.df.copy()
        if "historical_volatility" not in df.columns:
            df["historical_volatility"] = df.get("implied_volatility", 0.2)
        return engineer_features(df)


def _ttm_years(dates, exdates):
    """Calendar-day year fractions between two date-like columns (accepts
    YYYYMMDD ints/strings and ISO strings — both real-vendor conventions)."""
    import pandas as pd

    def parse(col):
        s = col.astype(str).str.strip()
        # YYYYMMDD integers (OptionMetrics) vs ISO/US strings (CBOE)
        if s.str.fullmatch(r"\d{8}").all():
            return pd.to_datetime(s, format="%Y%m%d")
        return pd.to_datetime(s, format="mixed")

    d0, d1 = parse(dates), parse(exdates)
    return (d1 - d0).dt.days.to_numpy(np.float64) / 365.0


def parse_optionmetrics(df, spot=None, rate: float = 0.0):
    """Standardize an OptionMetrics ``opprcd``-style frame (real
    conventions: ``strike_price`` ×1000, ``cp_flag`` C/P, ``best_bid``/
    ``best_offer``, ``date``/``exdate`` as YYYYMMDD,
    ``impl_volatility``). ``spot`` comes from the security file in the
    real product, so it is a parameter here (scalar or per-row array);
    likewise ``rate``. Reference anchor: ``src/data/data_loader.py:509``
    (vendor-format standardization map).
    Returns a canonical-columns DataFrame for :class:`OptionChainDataset`.
    """
    import pandas as pd

    out = pd.DataFrame()
    # OptionMetrics opprcd ALWAYS stores strikes in thousandths of a
    # dollar — unconditional (a magnitude heuristic would silently leave
    # low-priced underlyings' strikes 1000x too large)
    out["strike_price"] = np.asarray(df["strike_price"], np.float64) / 1000.0
    out["option_type"] = (df["cp_flag"].astype(str).str.upper().str[0]
                          .map({"C": "call", "P": "put"}))
    bid = np.asarray(df["best_bid"], np.float64)
    ask = np.asarray(df["best_offer"], np.float64)
    out["bid"], out["ask"] = bid, ask
    out["option_price"] = 0.5 * (bid + ask)
    out["time_to_maturity"] = _ttm_years(df["date"], df["exdate"])
    if "impl_volatility" in df.columns:
        out["implied_volatility"] = np.asarray(df["impl_volatility"],
                                               np.float64)
    for c in ("volume", "open_interest"):
        if c in df.columns:
            out[c] = df[c]
    if spot is None:
        raise DataError("OptionMetrics option files carry no underlying "
                        "price; pass spot= (from the security file)")
    out["underlying_price"] = np.asarray(spot, np.float64)
    out["risk_free_rate"] = float(rate)
    return out


def parse_cboe_quotedata(path, rate: float = 0.0, as_of=None):
    """Parse a CBOE ``quotedata``-style CSV: two header lines (underlying
    description + last price, then the retrieval timestamp) followed by
    side-by-side calls/puts rows sharing an expiration and strike. Real
    layout: ``Expiration Date,Calls,Last Sale,Net,Bid,Ask,Volume,IV,
    Delta,Gamma,Open Interest,Strike,Puts,...(same 10 for puts)``.
    Returns a LONG-format canonical DataFrame (one row per option).
    """
    import pandas as pd

    with open(path) as f:
        header1 = f.readline()
        header2 = f.readline()  # retrieval timestamp, e.g. "Apr 17 2026 @ 15:45 ET"
        body = pd.read_csv(f)
    # "SPX (S&P 500 INDEX),5123.41,+12.3" — last price is field 2
    try:
        spot = float(header1.split(",")[1])
    except (IndexError, ValueError) as e:
        raise DataError(f"cannot parse underlying price from CBOE header "
                        f"{header1!r}") from e
    if as_of is None:
        try:
            as_of = pd.to_datetime(header2.split("@")[0].strip(),
                                   format="mixed")
        except (ValueError, IndexError) as e:
            # refusing to silently fall back to "now": a stale file would
            # get every TTM computed from the parse-time clock
            raise DataError(
                f"cannot parse the as-of date from CBOE header line 2 "
                f"{header2!r}; pass as_of= explicitly") from e
    else:
        as_of = pd.to_datetime(as_of)
    # pandas suffixes the duplicated put-side columns with ".1" on read
    body.columns = [str(c).strip().lower().replace(" ", "_")
                    for c in body.columns]
    ttm = _ttm_years(pd.Series([as_of] * len(body)).astype(str),
                     body["expiration_date"])
    col_map = {"last_sale": "last", "bid": "bid", "ask": "ask",
               "volume": "volume", "iv": "implied_volatility",
               "open_interest": "open_interest"}
    rows = []
    for side, suffix in (("call", ""), ("put", ".1")):
        part = pd.DataFrame({
            "strike_price": pd.to_numeric(body["strike"], errors="coerce"),
            "time_to_maturity": ttm,
            "option_type": side,
        })
        for src, dst in col_map.items():
            key = src + suffix
            if key in body.columns:
                part[dst] = pd.to_numeric(body[key], errors="coerce")
        part["option_price"] = 0.5 * (part["bid"] + part["ask"])
        rows.append(part)
    out = pd.concat(rows, ignore_index=True)
    out["underlying_price"] = spot
    out["risk_free_rate"] = float(rate)
    return out


class OptionChainLoader:
    @staticmethod
    def from_csv(path, **read_kwargs) -> OptionChainDataset:
        import pandas as pd

        return OptionChainDataset(pd.read_csv(path, **read_kwargs))

    @staticmethod
    def from_optionmetrics(path, spot=None, rate: float = 0.0,
                           **read_kwargs) -> OptionChainDataset:
        import pandas as pd

        return OptionChainDataset(parse_optionmetrics(
            pd.read_csv(path, **read_kwargs), spot=spot, rate=rate))

    @staticmethod
    def from_cboe(path, rate: float = 0.0, as_of=None) -> OptionChainDataset:
        return OptionChainDataset(parse_cboe_quotedata(path, rate=rate,
                                                       as_of=as_of))

    @staticmethod
    def from_parquet(path, **read_kwargs) -> OptionChainDataset:
        import pandas as pd

        return OptionChainDataset(pd.read_parquet(path, **read_kwargs))

    @staticmethod
    def from_synthetic(n_rows: int = 500, spot: float = 100.0, seed: int = 0,
                       **kwargs) -> OptionChainDataset:
        from .synthetic import generate_synthetic_chain

        return OptionChainDataset(generate_synthetic_chain(n_rows=n_rows, spot=spot,
                                                           seed=seed, **kwargs))

    @staticmethod
    def from_yfinance(ticker: str, **kwargs) -> OptionChainDataset:
        if not YFINANCE_AVAILABLE:
            raise DependencyError(
                "yfinance is not installed; use from_csv/from_parquet/from_synthetic")
        from .market import fetch_option_chain  # pragma: no cover

        return OptionChainDataset(fetch_option_chain(ticker, **kwargs))


def load_option_data(source="synthetic", **kwargs) -> OptionChainDataset:
    """One-call loader (reference: ``data_loader.py:548``)."""
    loaders = {
        "csv": OptionChainLoader.from_csv,
        "parquet": OptionChainLoader.from_parquet,
        "synthetic": OptionChainLoader.from_synthetic,
        "yfinance": OptionChainLoader.from_yfinance,
        "cboe": OptionChainLoader.from_cboe,
        "optionmetrics": OptionChainLoader.from_optionmetrics,
    }
    if source not in loaders:
        raise DataError(f"unknown source {source!r}; choose {list(loaders)}")
    return loaders[source](**kwargs)
