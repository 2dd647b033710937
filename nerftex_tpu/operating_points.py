"""Adopted per-scene render operating points — single source of truth.

The reference renders with whatever the config says (render.py:18-42); this
repo's measured TPU operating points (ray blocking, hit capacities, cull
budgets, bf16 compute) were adopted through the round-3/4/5 A/B queues and
recorded in BASELINE.md / docs/PERF.md.  Until now they lived only as CLI
args in scripts (bench.py, scripts/ab.py presets) — serving paid raw-config
defaults, which is why RenderSession measured ~2x slower than bench on the
same chip (VERDICT r4 next #7).

Each entry:
  - "instancer": overrides merged into renderer_config.instancer_config
  - "renderer":  overrides merged into renderer_config
  - "compute_dtype": model compute dtype for the adopted point

Consumers: render/serve.RenderSession(operating_point=...), scripts/ab.py
presets, scripts/bench_serve.py.  Keep in sync with BASELINE.md rows.
"""

OPERATING_POINTS = {
    "carpet": {
        "compute_dtype": "bfloat16",
        "renderer": {"sorted_blocks": True},
        "instancer": {
            "ray_block": 1024,
            "max_hits": 48,
            "max_steps_per_ray": 320,
            "cull_budget": 448,
            "tri_cull_budget": 384,
        },
    },
    "grass": {
        "compute_dtype": "bfloat16",
        "renderer": {"sorted_blocks": True},
        "instancer": {
            "ray_block": 2048,
            "max_hits": 96,
            "max_steps_per_ray": 1024,
            "cull_budget": 512,
            "tri_cull_budget": 1024,
            "shadow_cull_budget": 512,
            "shadow_tri_cull_budget": 2048,
        },
    },
    "plush": {
        "compute_dtype": "bfloat16",
        "renderer": {"sorted_blocks": True},
        "instancer": {
            "ray_block": 2048,
            "max_hits": 128,
            "max_steps_per_ray": 1280,
            "cull_budget": 384,
            "tri_cull_budget": 1024,
            "shadow_cull_budget": 768,
            "shadow_tri_cull_budget": 1536,
            # Pallas overlap-resolution kernel: a PER-SCENE adopt (round-5d
            # A/B, docs/PERF.md §2.22) — +2.9% on plush's S=320/K=128
            # nearest_blend tier, but -18.8% on the carpet north-star, so
            # only plush turns it on.  NERFTEX_PALLAS_SELK overrides.
            "pallas_selk": 1,
        },
    },
}

# Scenes sharing a base geometry reuse its point.
ALIASES = {
    "carpet10k": "carpet",
    "grass_filtered": "grass",
    "fur": "plush",
}


def resolve(name):
    """Operating point for a scene stem, or None if unknown."""
    if name in ALIASES:
        name = ALIASES[name]
    return OPERATING_POINTS.get(name)


def infer_scene(config_module_or_path: str):
    """'configs/config_carpet_render.py' / 'configs.config_carpet_render'
    -> 'carpet' (None if the name doesn't follow the config_<scene>_<mode>
    convention)."""
    import os

    s = str(config_module_or_path)
    if s.endswith(".py"):
        s = s[:-3]
    stem = os.path.basename(s.replace(".", "/"))
    if stem.startswith("config_") and "_" in stem[7:]:
        return stem[7:].rsplit("_", 1)[0]
    return None
