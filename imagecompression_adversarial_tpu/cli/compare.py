"""CLI: pairwise image-quality comparison between two globs.

Mirrors ``python utils/metrics_compare/compare.py a/*.png b/*.png``
(`/root/reference/utils/metrics_compare/compare.py:1-20`).
"""

from __future__ import annotations

import sys

from ..metrics.compare import compare_globs


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "-device" in argv:
        i = argv.index("-device")
        device = argv[i + 1]
        del argv[i : i + 2]
        import jax

        if device == "cpu":
            jax.config.update("jax_platforms", "cpu")
    if len(argv) != 2:
        raise SystemExit("usage: compare [-device cpu|tpu] <glob_a> <glob_b>")
    compare_globs(argv[0], argv[1])


if __name__ == "__main__":
    main()
