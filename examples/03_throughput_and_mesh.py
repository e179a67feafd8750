#!/usr/bin/env python
"""Throughput mode (scan batching) and multi-chip data parallelism.

Run: python examples/03_throughput_and_mesh.py
(uses a virtual 8-device CPU mesh; on a TPU pod slice the same code shards
across real chips)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")

from tpuvf.cli.launch import parse_pipeline
from tpuvf.parallel.mesh import make_mesh

DESC = ("videotestsrc num-buffers=16 pattern=ball "
        "! video/x-raw,format=NV12,width=320,height=180 "
        "! vfvideofilter contrast=1.3 ! vfconvertscale "
        "! video/x-raw,format=BGRA,width=160,height=90 ! appsink")

# 1. single device, batched: one XLA dispatch per 8 frames
p = parse_pipeline(DESC)
p.negotiate(); p.build()
p.run_batched(16, batch_size=8)
print("batched:", p.stats.summary())

# 2. data parallel across a device mesh (here 4 virtual chips)
p2 = parse_pipeline(DESC)
p2.negotiate(); p2.build()
mesh = make_mesh({"dp": 4})
p2.run_batched(16, batch_size=16, mesh=mesh)
print("4-chip dp:", p2.stats.summary())

# 3. data x spatial parallel: plane ROWS shard over the 'sp' axis; the
# blur/deinterlace/chroma-upsample stencils exchange ppermute halos over
# ICI and the output is pixel-exact vs the single-chip program.  Scaled
# geometry also row-shards (the resampling matmuls all-gather their row
# operand over ICI and compute only each shard's output band); heights
# that don't divide into even rows per shard are rejected with a clear
# error.
DESC_SP = ("videotestsrc num-buffers=8 pattern=ball "
           "! video/x-raw,format=NV12,width=320,height=184 "
           "! vfdeinterlace method=bob "
           "! vfvideofilter sharpness=0.5 contrast=1.3 ! appsink")
p3 = parse_pipeline(DESC_SP)
p3.negotiate(); p3.build()
mesh2 = make_mesh({"dp": 2, "sp": 4})
p3.run_batched(8, batch_size=8, mesh=mesh2, sp_axis="sp")
print("2x4 dp x sp:", p3.stats.summary())
