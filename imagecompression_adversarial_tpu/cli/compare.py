"""CLI: pairwise image-quality comparison between two globs.

Mirrors ``python utils/metrics_compare/compare.py a/*.png b/*.png``
(`/root/reference/utils/metrics_compare/compare.py:1-20`).
"""

from __future__ import annotations

import argparse

from ..metrics.compare import compare_globs


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="compare", description=__doc__.splitlines()[0]
    )
    p.add_argument("glob_a", help="first image glob (e.g. 'ori/*.png')")
    p.add_argument("glob_b", help="second image glob, pairwise vs the first")
    p.add_argument("-device", choices=("cpu", "tpu"), default=None,
                   help="force the metric computation backend")
    args = p.parse_args(argv)
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    compare_globs(args.glob_a, args.glob_b)


if __name__ == "__main__":
    main()
