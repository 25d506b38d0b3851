"""Certified American bracket under Dupire local vol.

Oracles:
 - FLAT surface: local vol degenerates to BS(0.2) and log-Euler is EXACT
   at constant vol, so the bracket must overlap the GBM certification
   machinery's Bermudan bracket (``models/american.py`` — a completely
   independent architecture) and contain the continuous BS American
   within the pad;
 - sample smile: ordering/width sanity + the continuous LV-PDE American
   sits in [lower, continuous_upper];
 - error paths.
Beyond the reference: its local vol prices European vanillas only
(``src/pricing_models/local_vol.py:181-262``).
"""

import pytest

from optionslab_tpu.models import local_vol_american_bracket
from optionslab_tpu.models.american import american_price_interval
from optionslab_tpu.models.fdm import fdm_price
from optionslab_tpu.models.local_vol import DupireLocalVol, sample_smile_iv_fn
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

S, K, T, R, VOL = 100.0, 100.0, 1.0, 0.05, 0.2


@pytest.fixture(scope="module")
def flat():
    return DupireLocalVol(lambda k, t: VOL + 0.0 * k + 0.0 * t, S, R)


@pytest.fixture(scope="module")
def smile():
    return DupireLocalVol(sample_smile_iv_fn(), S, R)


class TestFlatIsBS:
    @pytest.fixture(scope="class")
    def bracket(self, flat):
        return local_vol_american_bracket(flat, K, T, n_dates=16, n_sub=4,
                                          n_outer=2048, n_inner=512,
                                          n_space=301, steps_per_date=6,
                                          seed=0)

    def test_width_subcent(self, bracket):
        assert bracket["width"] < 0.01, bracket
        assert bracket["width"] > -3 * (bracket["lower_se"]
                                        + bracket["upper_se"]), bracket
        assert bracket["lower_se"] < 0.005 and bracket["upper_se"] < 0.005

    @pytest.mark.slow
    def test_overlaps_gbm_certified_bracket(self, bracket):
        """Same Bermudan-16 number certified by two INDEPENDENT
        machineries (transition-matrix grid dual vs LV-PDE-surface dual)
        — the intervals must overlap."""
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


class TestSmile:
    @pytest.fixture(scope="class")
    def bracket(self, smile):
        return local_vol_american_bracket(smile, K, T, n_dates=16, n_sub=4,
                                          n_outer=2048, n_inner=512,
                                          n_space=301, steps_per_date=6,
                                          seed=1)

    def test_width_and_ordering(self, bracket):
        assert bracket["width"] < 0.015, bracket
        # skewed smile lifts the ATM put well above the flat-vol value
        assert bracket["lower"] > 6.3, bracket

    def test_contains_continuous_lv_pde(self, bracket, smile):
        am_pde = float(smile._solve(K, T, -1.0, american=True))
        assert bracket["lower"] - 3 * bracket["lower_se"] - 0.01 < am_pde
        assert am_pde < bracket["continuous_upper"] \
            + 3 * bracket["upper_se"] + 0.01, (bracket, am_pde)

    def test_bermudan_below_continuous(self, bracket, smile):
        am_pde = float(smile._solve(K, T, -1.0, american=True))
        # Bermudan-16 <= continuous American (up to stderr + PDE error)
        assert bracket["lower"] - 3 * bracket["lower_se"] < am_pde + 0.02


class TestValidation:
    def test_calls_rejected(self, flat):
        with pytest.raises(ValidationError):
            local_vol_american_bracket(flat, K, T, cp=1.0)

    def test_pde_diagnostic_close(self, flat):
        """lv_bermudan (implicit-Euler PDE) sits within its own O(dt)
        error of the certified interval — and the certificate, not the
        PDE, is the truth."""
        b = local_vol_american_bracket(flat, K, T, n_dates=8, n_sub=4,
                                       n_outer=1024, n_inner=256,
                                       n_space=301, steps_per_date=8,
                                       seed=2)
        assert abs(b["lv_bermudan"] - b["lower"]) < 0.05, b
