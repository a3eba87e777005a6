"""Shared CLI plumbing for the task entry points."""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional

import jax

from fastvim_tpu.config import load_config


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Turn on JAX's persistent (on-disk) compilation cache.

    The detection/segmentation programs compile in minutes at recipe
    scale (STATUS.md round-3: cascade train step 2-20 min); the cache
    makes every compile after the first per (program, topology) a disk
    read. Default dir ~/.cache/fastvim_tpu/xla, override with
    FASTVIM_COMPILE_CACHE (set to "0" to disable). Safe to call more
    than once; failures (e.g. a backend that cannot serialize
    executables) degrade to a warning, never an error."""
    env = os.environ.get("FASTVIM_COMPILE_CACHE", "")
    if env == "0":
        return
    cache_dir = os.path.expanduser(
        env or cache_dir or "~/.cache/fastvim_tpu/xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:  # pragma: no cover - backend-dependent
        import warnings

        warnings.warn(f"persistent compilation cache unavailable: {e}")


def base_parser(description: str) -> argparse.ArgumentParser:
    """Mirrors the reference CLI surface: --config_name X.yaml
    --model_save_dir … (README.md:62,72,81,89) plus key=value overrides."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config_name", "--config", required=True,
                   help="config name (e.g. FastVimT) or path")
    p.add_argument("--model_save_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data_dir", default=None,
                   help="dataset root (overrides config data.dir)")
    p.add_argument("--epochs", type=int, default=None,
                   help="override training_epochs (smoke runs)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--synthetic_samples", type=int, default=512)
    p.add_argument("overrides", nargs="*",
                   help="key=value config overrides")
    return p


def load_cli_config(args, domain: str) -> Dict[str, Any]:
    enable_compilation_cache()
    cfg = load_config(args.config_name, domain=domain,
                      overrides=args.overrides)
    if args.data_dir is not None:
        cfg.setdefault("data", {})["dir"] = args.data_dir
    if args.epochs is not None:
        cfg["training_epochs"] = args.epochs
    if args.batch_size is not None:
        cfg["batch_size"] = args.batch_size
    return cfg


def world_size() -> int:
    return jax.device_count()


def setup_mesh():
    from fastvim_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    return mesh, lambda b: shard_batch(b, mesh)
