"""Scale configs from BASELINE.json as pytest-coverable (slow) tests:
4096x4096 + non-multiple-of-32 large images, and the 256-image lockstep
batch. Promoted from tools/config_checks.py (round-1 VERDICT item 9) so the
configs cannot silently rot outside the suite."""
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.slow
def test_big_image_configs():
    import config_checks
    out = config_checks.big_image(verbose=False)
    assert out["stream"] > 0 and out["stream_odd"] > 0


@pytest.mark.slow
def test_lockstep_batch256():
    import config_checks
    out = config_checks.batch256(verbose=False, check_every=32)
    assert out["checked"] == 8
