"""Dump optimized HLO of a bench config's scan-batched program:
python scripts/dump_hlo.py <name> [batch] > /tmp/hlo.txt
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-tpu-cache")

from bench import configs as C  # noqa: E402
from tpuvf.runtime.benchmark import make_batch_fn  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "headline"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    label, step, state0, params, spec_or_mk = C.ALL[name]()
    if callable(spec_or_mk):
        planes = spec_or_mk(batch)
    else:
        from tpuvf.runtime.benchmark import random_planes_for_spec

        planes = random_planes_for_spec(
            spec_or_mk, batch, split=getattr(step, "source_split", False))
    fn = make_batch_fn(step)
    compiled = fn.lower(planes, state0, params).compile()
    print(compiled.as_text())
    print("DONE-SENTINEL", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
