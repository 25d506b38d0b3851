"""Certified American bracket under STOCHASTIC LOCAL VOL.

Oracles:
 - mixing -> 0 on a FLAT surface with v0 = theta: the leverage is
   exactly 1 and the variance is constant, so the transition law is
   EXACT constant-vol log-Euler — the bracket must overlap the GBM
   certification machinery's bracket (``models/american.py``, a
   completely independent architecture: transition-matrix grid dual)
   and contain the continuous BS American within the pad;
 - sample smile at mixing 1: ordering/width sanity, the bracket
   contains the SLV European-floor (an American put dominates the
   European on the same law), and sits between the certified LV and a
   reasonability band;
 - error paths.
The reference has no SLV and no American machinery beyond a flat-vol
binomial.
"""

import jax
import pytest

from optionslab_tpu.models.american import american_price_interval
from optionslab_tpu.models.fdm import fdm_price
from optionslab_tpu.models.heston import HestonParams
from optionslab_tpu.models.local_vol import DupireLocalVol, sample_smile_iv_fn
from optionslab_tpu.models.slv import slv_exotic_price
from optionslab_tpu.models.slv_american import slv_american_bracket
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

S, K, T, R, VOL = 100.0, 100.0, 1.0, 0.05, 0.2
# v0 = theta = VOL^2 so the mixing->0 flat limit is BS(VOL) exactly
PAR = HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7)


@pytest.fixture(scope="module")
def flat():
    return DupireLocalVol(lambda k, t: VOL + 0.0 * k + 0.0 * t, S, R)


@pytest.fixture(scope="module")
def smile():
    return DupireLocalVol(sample_smile_iv_fn(), S, R)


class TestFlatMixingZeroIsBS:
    @pytest.fixture(scope="class")
    def bracket(self, flat):
        return slv_american_bracket(flat, PAR, K, T, mixing=0.0,
                                    n_dates=16, n_sub=4, n_fit=50_000,
                                    n_lower=100_000, n_outer=512,
                                    n_inner=512, n_cal_paths=32_768,
                                    seed=0)

    def test_ordering_and_width(self, bracket):
        tol = 3 * (bracket["lower_se"] + bracket["upper_se"])
        assert bracket["lower"] <= bracket["upper"] + tol, bracket
        assert bracket["width"] < 0.10, bracket

    @pytest.mark.slow
    def test_overlaps_gbm_certified_bracket(self, bracket):
        """The same Bermudan-16 value certified by two independent
        machineries (grid dual vs SLV LSM+value-surface dual)."""
        g = american_price_interval(S, K, T, R, VOL, cp=-1.0, n_dates=16,
                                    method="grid")
        assert g["lower"] - 3 * g["lower_se"] \
            < bracket["upper"] + 3 * bracket["upper_se"]
        assert bracket["lower"] - 3 * bracket["lower_se"] \
            < g["upper"] + 3 * g["upper_se"], (bracket, g)

    def test_contains_continuous_bs_american(self, bracket):
        bs_am = float(fdm_price(ContractBatch.make(S, K, T, R, VOL, "put"),
                                american=True))
        assert bracket["lower"] - 3 * bracket["lower_se"] < bs_am
        assert bs_am < bracket["continuous_upper"] \
            + 3 * bracket["upper_se"], (bracket, bs_am)


class TestSmileMixingOne:
    @pytest.fixture(scope="class")
    def bracket(self, smile):
        return slv_american_bracket(smile, PAR, K, T, mixing=1.0,
                                    n_dates=16, n_sub=4, n_fit=50_000,
                                    n_lower=100_000, n_outer=512,
                                    n_inner=512, n_cal_paths=32_768,
                                    seed=1)

    def test_ordering_and_width(self, bracket):
        tol = 3 * (bracket["lower_se"] + bracket["upper_se"])
        assert bracket["lower"] <= bracket["upper"] + tol, bracket
        assert bracket["width"] < 0.10, bracket
        assert bracket["lower_se"] < 0.05 and bracket["upper_se"] < 0.05
        assert bracket["mixing"] == 1.0

    def test_dominates_slv_european(self, smile, bracket):
        """American put >= European put on the SAME dynamics (priced by
        the independent particle-scan engine)."""
        sf = smile.surface
        euro, se = slv_exotic_price(
            "european", S, K, T, R, PAR, jax.random.PRNGKey(3),
            sf.k_grid, sf.t_grid, sf.grid, cp=-1.0, mixing=1.0,
            n_paths=131_072, n_steps=64, return_stderr=True)
        assert bracket["upper"] + 3 * bracket["upper_se"] \
            > float(euro) - 3 * float(se), (bracket, float(euro))


class TestValidation:
    def test_call_rejected(self, flat):
        with pytest.raises(ValidationError):
            slv_american_bracket(flat, PAR, K, T, cp=1.0)

    def test_accepts_bare_surface(self, flat):
        out = slv_american_bracket(flat.surface, PAR, K, T, mixing=0.5,
                                   n_dates=4, n_sub=2, n_fit=20_000,
                                   n_lower=20_000, n_outer=128,
                                   n_inner=128, n_cal_paths=16_384, seed=2)
        assert out["lower"] <= out["upper"] + 3 * (out["lower_se"]
                                                   + out["upper_se"])


class TestADIMethod:
    """Round-4 tightening: the SLV Bermudan-ADI slices (leverage in the
    x-diffusion per step, from the SAME frozen rows the MC replays)
    drive policy + dual + a martingale CV for the lower bound — the
    construction that took the Heston bracket from ~0.05 to ~1e-3."""

    def test_certified_width_at_most_one_cent(self, smile):
        br = slv_american_bracket(smile, PAR, K, T, mixing=1.0,
                                  n_dates=16, n_sub=2, n_outer=2048,
                                  n_inner=1024, n_cal_paths=131_072,
                                  method="adi", seed=0)
        assert br["method"] == "adi"
        tol = 3 * (br["lower_se"] + br["upper_se"])
        assert br["lower"] <= br["upper"] + tol, br
        # the round-4 acceptance bar at the standard smile/mixing=1 point
        assert br["width"] <= 0.012, br
        # the bracket independently certifies the PDE value itself
        assert abs(br["adi_bermudan"] - 0.5 * (br["lower"] + br["upper"])) \
            < 0.05, br

    def test_flat_mixing0_tight_and_overlaps_gbm(self, flat):
        br = slv_american_bracket(flat, PAR, K, T, mixing=0.0,
                                  n_dates=16, n_sub=2, n_outer=1024,
                                  n_inner=512, n_cal_paths=65_536,
                                  method="adi", seed=0)
        assert br["width"] < 6e-3, br
        g = american_price_interval(S, K, T, R, VOL, cp=-1.0, n_dates=16,
                                    method="grid")
        # exact-law coincidence: cross-machinery overlap at 4 joint se
        tol = 4 * (br["lower_se"] + br["upper_se"]
                   + float(g["lower_se"]) + float(g["upper_se"])) + 2e-3
        assert br["lower"] - tol < float(g["upper"])
        assert float(g["lower"]) < br["upper"] + tol, (br, g)

    def test_lsm_method_still_available_and_consistent(self, smile):
        adi = slv_american_bracket(smile, PAR, K, T, mixing=1.0,
                                   n_dates=8, n_sub=2, n_outer=512,
                                   n_inner=256, n_cal_paths=32_768,
                                   method="adi", seed=3)
        lsm = slv_american_bracket(smile, PAR, K, T, mixing=1.0,
                                   n_dates=8, n_sub=2, n_fit=30_000,
                                   n_lower=50_000, n_outer=512,
                                   n_inner=256, n_cal_paths=32_768,
                                   method="lsm", seed=3)
        # the two methods bracket the same frozen-leverage Bermudan value
        lo = max(adi["lower"] - 3 * adi["lower_se"],
                 lsm["lower"] - 3 * lsm["lower_se"])
        hi = min(adi["upper"] + 3 * adi["upper_se"],
                 lsm["upper"] + 3 * lsm["upper_se"])
        assert lo <= hi + 1e-3, (adi, lsm)

    def test_method_validation(self, flat):
        with pytest.raises(ValidationError):
            slv_american_bracket(flat, PAR, K, T, method="nope")
