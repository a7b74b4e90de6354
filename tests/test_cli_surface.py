"""Every CLI entry point imports and its parser answers --help.

The acceptance checklist (SURVEY §7.4) is about the public CLI surface;
this keeps a wiring regression (bad import, broken flag registration)
from shipping silently.  Parser-level only — the heavyweight end-to-end
paths are exercised by the engine tests and on-chip runs.
"""

import importlib

import pytest

CLI_MODULES = [
    "attack_cv",
    "attack_cw",
    "attack_data",
    "attack_ifgsm",
    "attack_linear",
    "attack_patch",
    "attack_rd",
    "classifier_train",
    "codec",
    "compare",
    "feature_range",
    "jpeg_baseline",
    "mmd",
    "random_noise",
    "recompression",
    "search",
    "self_ensemble",
    "test",
    "train",
    "train_hific",
    "transfer_noise",
    "visual",
    "visual_distribution",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help_exits_zero(name, capsys):
    mod = importlib.import_module(
        f"imagecompression_adversarial_tpu.cli.{name}"
    )
    assert hasattr(mod, "main"), f"cli.{name} has no main()"
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()


def test_reference_flag_spellings_parse():
    """The reference's public flag spellings (SURVEY §7.4) must all parse."""
    from imagecompression_adversarial_tpu.config import parse_config

    cfg = parse_config(
        [
            "-m", "hyper", "-metric", "mse", "-q", "2",
            "-s", "/tmp/x/*.png", "-steps", "101", "-noise", "1e-4",
            "-e", "8", "-lr_attack", "0.01", "--defend",
            "--defend_m", "ensemble", "--debug", "--no-clamp",
        ]
    )
    assert cfg.model == "hyper" and cfg.quality == 2
    assert cfg.steps == 101 and not cfg.clamp


def test_compile_cache_flag(tmp_path):
    """-compile_cache points XLA's persistent cache at the dir; 'none' is a
    no-op (the knob keeps its previous value).

    `-device cpu` keeps apply_precision from undoing conftest's CPU pin
    (ADVICE r4: the default 'tpu' would re-enable the axon backend for the
    rest of the session).  The prior cache-dir value is restored afterwards
    so slow tests later in the session stay uncached (conftest keeps the
    persistent cache off deliberately).
    """
    import jax

    from imagecompression_adversarial_tpu.config import (
        apply_precision,
        parse_config,
    )

    prev = jax.config.jax_compilation_cache_dir
    target = tmp_path / "xla_cache"
    try:
        cfg = parse_config(["-device", "cpu", "-compile_cache", str(target)])
        apply_precision(cfg)
        assert jax.config.jax_compilation_cache_dir == str(target)
        assert target.is_dir()

        # 'none' must not touch the global knob (and must not crash)
        apply_precision(parse_config(["-device", "cpu", "-compile_cache", "none"]))
        assert jax.config.jax_compilation_cache_dir == str(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
