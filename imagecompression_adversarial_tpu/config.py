"""Shared configuration: dataclass + the public CLI flag surface.

Every entry point shares one parser, like the reference's ``coder.config()``
(`/root/reference/coder.py:166-219`).  The documented public flags
(README.md:5-46) keep their exact spellings: ``-m -metric -q -s -t -steps
-noise -lr_attack -e -la* --mask_loc --adv --defend --defend_m --debug
--no-clamp -random -ssteps -re -p ...``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional


@dataclasses.dataclass
class Config:
    # device / precision
    device: str = "tpu"
    precision: str = "highest"  # matmul precision: 'highest' for parity, 'bfloat16' for speed
    trace: Optional[str] = None  # dump a jax.profiler trace to this directory
    # training
    lr_train: float = 1e-4
    lamb: Optional[float] = None
    eval: bool = False
    adv: bool = False
    batch_size: int = 8
    # model
    model: str = "hyper"
    metric: str = "ms-ssim"
    quality: int = 3
    new: bool = False
    padding_mode: str = "reflect"
    # attack
    steps: int = 1001
    random: int = 1
    # best-of-restarts execution: 'vmap' (one batched program) or 'host'
    # (sequential programs; survives libtpu faults on big vmapped attacks)
    # host-looped restarts measured faster than the vmapped batch on a
    # saturated chip in rounds 1-2 (vmap-of-attack ~3x slower) and the
    # vmapped fic 768x512 best-of-2 program faults the TPU worker
    restart_impl: str = "host"
    # two-phase loss lowering (attacks/common.py RDAttackConfig)
    two_phase_impl: str = "cond"
    lamb_attack: float = 0.2
    noise: float = 0.0001
    lr_attack: float = 0.01
    source: str = "./datasets/kodak/kodim*.png"
    target: Optional[str] = None
    checkpoint: Optional[str] = None
    mask_loc: Optional[List[int]] = None
    lamb_bkg_in: float = 1.0
    lamb_bkg_out: float = 1.0
    lamb_tar: float = 1.0
    att_metric: str = "L2"
    epsilon: float = 16.0
    rate: bool = False
    pad: Optional[int] = None
    log: str = "./logs/log.txt"
    debug: bool = False
    clamp: bool = True
    search_steps: int = 20
    recompress: Optional[int] = None
    epochs: Optional[int] = None  # override the 200/100 (adv) default
    # defense
    defend: bool = False
    method: str = "ensemble"
    # in-loop ensemble evaluation for --adv: 'scan' (sequential per-variant,
    # full-resolution-safe) or 'batch' (two 4-variant batches)
    ensemble_impl: str = "scan"
    profile: Optional[str] = None  # latent range/rank profile (.npz) for clip
    degrade: Optional[str] = None
    finetune: bool = False
    # batching (TPU extension: images attacked per device step)
    attack_batch: int = 1
    # phase-space attack loss: 'auto' (on whenever exactly equivalent),
    # 'on', 'off' — see attacks/common.py RDAttackConfig.phase_space_loss
    phase_space: str = "auto"
    # compile the attack scan and the evaluation as separate XLA programs
    # (megapixel single-chip attacks; RESULTS.md round 3)
    split_eval: bool = False
    encode: bool = False  # cli.codec: batch-encode a glob to .bin files
    decode: bool = False  # cli.codec: decode a glob of .bin files
    # persistent XLA compilation cache directory ('none' disables); makes a
    # re-run of any CLI skip its multi-minute first compile entirely
    compile_cache: str = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "ICAT_COMPILE_CACHE", "~/.cache/icat/xla"
        )
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native adversarial toolkit for learned image compression"
    )
    d = Config()
    p.add_argument("-device", type=str, default=d.device, help="jax platform")
    p.add_argument("-precision", type=str, default=d.precision,
                   help="matmul precision: highest|float32|bfloat16|default")
    p.add_argument("-trace", dest="trace", type=str, default=d.trace,
                   help="dump a jax.profiler trace (TensorBoard format) of "
                        "the hot section to this directory")
    # train
    p.add_argument("-lr_train", dest="lr_train", type=float, default=d.lr_train)
    p.add_argument("-lamb", dest="lamb", type=float, default=d.lamb,
                   help="training lambda (default: per-quality table)")
    p.add_argument("--eval", dest="eval", action="store_true")
    p.add_argument("--adv", action="store_true", help="adversarial training")
    p.add_argument("-batch_size", type=int, default=d.batch_size)
    # model
    p.add_argument("-m", dest="model", type=str, default=d.model,
                   help="factorized|hyper|context|cheng2020|debug")
    p.add_argument("-metric", dest="metric", type=str, default=d.metric,
                   help="mse or ms-ssim (checkpoint flavour)")
    p.add_argument("-q", dest="quality", type=int, default=d.quality)
    p.add_argument("--new", dest="new", action="store_true", help="fresh params")
    p.add_argument("-padmode", dest="padding_mode", type=str, default=d.padding_mode)
    # attack
    p.add_argument("-steps", dest="steps", type=int, default=d.steps)
    p.add_argument("-random", dest="random", type=int, default=d.random,
                   help="random restarts (best-of)")
    p.add_argument("-restart_impl", dest="restart_impl", type=str,
                   default=d.restart_impl, choices=("vmap", "host"),
                   help="best-of-restarts execution: sequential host loop "
                        "(default: faster on a saturated chip, immune to "
                        "the vmapped-fic worker fault) or vmapped batch")
    p.add_argument("-la", dest="lamb_attack", type=float, default=d.lamb_attack)
    p.add_argument("-noise", dest="noise", type=float, default=d.noise,
                   help="input L2 noise threshold")
    p.add_argument("-lr_attack", dest="lr_attack", type=float, default=d.lr_attack)
    p.add_argument("-s", dest="source", type=str, default=d.source)
    p.add_argument("-t", dest="target", type=str, default=d.target)
    p.add_argument("-ckpt", dest="checkpoint", type=str, default=d.checkpoint,
                   help="local checkpoint (.pth/.pth.tar via converter, or .msgpack)")
    p.add_argument("--mask_loc", nargs="+", type=int, default=d.mask_loc)
    p.add_argument("-la_bkg_in", dest="lamb_bkg_in", type=float, default=d.lamb_bkg_in)
    p.add_argument("-la_bkg_out", dest="lamb_bkg_out", type=float, default=d.lamb_bkg_out)
    p.add_argument("-la_tar", dest="lamb_tar", type=float, default=d.lamb_tar)
    p.add_argument("-att_metric", dest="att_metric", type=str, default=d.att_metric,
                   help="L2 or ms-ssim")
    p.add_argument("-e", dest="epsilon", type=float, default=d.epsilon,
                   help="L-inf noise budget (/255)")
    p.add_argument("-r", dest="rate", action="store_true", help="rate attack flag")
    p.add_argument("-p", dest="pad", type=int, default=d.pad)
    p.add_argument("--log", dest="log", type=str, default=d.log)
    p.add_argument("--debug", dest="debug", action="store_true")
    p.add_argument("--no-clamp", dest="clamp", action="store_false")
    p.add_argument("-ssteps", dest="search_steps", type=int, default=d.search_steps)
    p.add_argument("-re", dest="recompress", type=int, default=d.recompress)
    p.add_argument("-epochs", dest="epochs", type=int, default=d.epochs,
                   help="training epochs (default 200, 100 with --adv)")
    # defense
    p.add_argument("--defend", action="store_true")
    p.add_argument("--defend_m", dest="method", type=str, default=d.method,
                   help="ensemble|resize|bitdepth|clip")
    p.add_argument("-ensemble_impl", dest="ensemble_impl", type=str,
                   default=d.ensemble_impl, choices=["scan", "batch"],
                   help="adaptive in-loop ensemble: sequential scan "
                        "(footprint-safe) or 4-wide batches")
    p.add_argument("-profile", dest="profile", type=str, default=d.profile,
                   help="latent range/rank profile .npz (for --defend_m clip; "
                        "defaults to the feature_range naming scheme)")
    p.add_argument("-degrade", dest="degrade", type=str, default=d.degrade)
    p.add_argument("--fintune", dest="finetune", action="store_true")
    # TPU extension
    p.add_argument("-attack_batch", dest="attack_batch", type=int,
                   default=d.attack_batch, help="images attacked per device step")
    p.add_argument("-phase_space", dest="phase_space", type=str,
                   default=d.phase_space, choices=("auto", "on", "off"),
                   help="phase-space attack loss (auto: on when equivalent)")
    p.add_argument("-two_phase", dest="two_phase_impl", type=str,
                   default=d.two_phase_impl, choices=("cond", "select"),
                   help="two-phase loss lowering: lax.cond (skips the "
                        "forward over budget) or scalar select (always "
                        "computes the output phase; no cond copies)")
    p.add_argument("--split_eval", dest="split_eval", action="store_true",
                   help="attack scan and eval as separate XLA programs "
                        "(megapixel single-chip attacks)")
    p.add_argument("--encode", action="store_true",
                   help="cli.codec: batch-encode the -s glob to .bin "
                        "bitstreams under -t (ref metrics_compare/encode.py)")
    p.add_argument("--decode", action="store_true",
                   help="cli.codec: decode a -s glob of .bin bitstreams to "
                        "PNGs under -t (ref metrics_compare/decode.py)")
    p.add_argument("-compile_cache", dest="compile_cache", type=str,
                   default=d.compile_cache,
                   help="persistent XLA compilation cache dir ('none' "
                        "disables); re-runs skip the first-compile wait")
    return p


def parse_config(argv=None) -> Config:
    ns = build_parser().parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(Config)})
    return cfg


def apply_precision(cfg: Config) -> None:
    """Set the global platform + matmul precision knobs before compilation."""
    import jax

    _setup_compile_cache(cfg.compile_cache)
    if cfg.device in ("cpu", "tpu"):
        # the sandbox site-hook forces platforms to "axon,cpu"; -device cpu
        # pins the host backend explicitly
        try:
            jax.config.update(
                "jax_platforms", "cpu" if cfg.device == "cpu" else "axon,cpu"
            )
        except RuntimeError:
            pass  # backends already initialized
    mapping = {
        "highest": "highest",
        "float32": "highest",
        "bfloat16": "bfloat16",
        "default": "default",
    }
    jax.config.update("jax_default_matmul_precision", mapping.get(cfg.precision, "highest"))


def _setup_compile_cache(path: Optional[str]) -> None:
    """Point XLA's persistent compilation cache at ``path``.

    Long programs here are compile-bound on first run (the 1001-step attack
    scan is ~3-4 min, the 12.6 MP split attack ~32 min — RESULTS.md), and the
    in-memory jit cache dies with the process.  The persistent cache stores
    serialized executables keyed by (HLO, compile options, backend version),
    so a second process re-running the same CLI skips straight to execution.
    Only programs that took >5 s to compile are written — microbenchmarks and
    test-suite programs never touch the disk.  Disable with
    ``-compile_cache none`` (or ``ICAT_COMPILE_CACHE=none``).
    """
    if not path or path.lower() in ("none", "off"):
        return
    import os

    import jax

    full = os.path.abspath(os.path.expanduser(path))
    try:
        os.makedirs(full, exist_ok=True)
        # threshold first: if this jax build lacks the knob, the except leaves
        # the cache fully OFF rather than active at jax's ~1s default
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_compilation_cache_dir", full)
    except (OSError, AttributeError, ValueError):
        # unwritable dir or a jax build without the knob: run uncached
        pass
