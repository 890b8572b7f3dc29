from ppn_tpu.configs.base import (
    COCO_EDGES,
    COCO_FLIP_PAIRS,
    COCO_KEYPOINT_NAMES,
    Config,
    DataConfig,
    MPII_EDGES,
    MPII_FLIP_PAIRS,
    MPII_KEYPOINT_NAMES,
    PPNConfig,
    TrainConfig,
    coco_r18_384,
    get_config,
    mpii_r18_224_fast,
    mpii_r18_384,
    mpii_r50_384,
    tiny_test,
)


def resolve_config(name: str, ini: str | None = None) -> Config:
    """Registry config, optionally overlaid with a reference-style
    config.ini (configs/ini_compat) — the shared `--config [--ini]`
    resolution of every CLI app."""
    if ini:
        from ppn_tpu.configs.ini_compat import load_ini

        return load_ini(ini, base=name)
    return get_config(name)


__all__ = [
    "resolve_config",
    "COCO_EDGES",
    "COCO_FLIP_PAIRS",
    "COCO_KEYPOINT_NAMES",
    "Config",
    "DataConfig",
    "MPII_EDGES",
    "MPII_FLIP_PAIRS",
    "MPII_KEYPOINT_NAMES",
    "PPNConfig",
    "TrainConfig",
    "coco_r18_384",
    "get_config",
    "mpii_r18_224_fast",
    "mpii_r18_384",
    "mpii_r50_384",
    "tiny_test",
]
