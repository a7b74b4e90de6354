"""CI coverage for the CompressAI parity harness (VERDICT r2 missing #1):
the --self-test mode must keep the north-star command runnable before real
zoo weights are available."""

import importlib.util
import os

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "parity_vs_compressai.py",
)


def test_parity_harness_self_test(capsys):
    spec = importlib.util.spec_from_file_location("parity_script", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.self_test()
    out = capsys.readouterr().out
    assert "SELF-TEST PASS" in out
    assert "jax psnr" in out  # the full harness eval loop really ran
