"""nerftex_tpu — a TPU-native NeRF-Tex framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hbaatz/nerf-tex (EGSR 2021): parameter-conditioned neural texture patches
trained from rendered swatches and instanced over arbitrary meshes at render
time.  The compute path is pure JAX (jit/pjit/shard_map + Pallas kernels);
the host-side scene compiler is numpy with an optional C++ fast path.

Layout:
    utils/       config runtime (EasyDict + reflection), rng, imaging helpers
    models/      encodings + conditioned NeRF MLPs (pure pytrees)
    ops/         ray/camera math, AABB proxies, volume compositing, pdf sampling
    data/        datasets, pixel/ray samplers, distributions, TFRecord IO
    instancing/  host scene compiler + device (XLA/Pallas) instancer
    render/      renderers, losses, train/render drivers, logger, checkpoints
    parallel/    device-mesh sharding helpers (dp ray sharding, psum grads)
    kernels/     Pallas TPU kernels for the hot ops
    tools/       offline dataset toolchain (asset gen, nerf2tfr, blur)

Reference parity is documented per symbol via `file:line` citations into the
upstream repo (see SURVEY.md).
"""

__version__ = "0.1.0"
