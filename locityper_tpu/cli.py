"""Command-line interface (counterpart of reference src/main.rs +
command/mod.rs dispatcher).

Subcommands: add, preproc, genotype, recruit, align, prune, paf-vcf.
"""
from __future__ import annotations

import argparse
import sys

from .utils.logging import setup_logging


def _enable_compile_cache():
    """Persistent XLA compilation cache: TPU kernel compiles (which can take
    minutes through remote-compile setups) are reused across runs.

    CPU backends are excluded: XLA's CPU cache key does not fingerprint
    the host machine type, so entries compiled on a different VM replay
    with 'machine type ... doesn't match' errors (seen round 5) — and CPU
    compiles are fast anyway."""
    import os
    try:
        import jax
        # Read the pinned platform WITHOUT initializing the backend
        # (jax.default_backend() here would break the later
        # jax.distributed.initialize in multi-process runs).
        platforms = jax.config.jax_platforms or ""
        if platforms.split(",")[0] == "cpu":
            return
        cache = os.environ.get("LOCITYPER_JAX_CACHE",
                               os.path.expanduser("~/.cache/locityper_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    setup_logging()
    _enable_compile_cache()
    from .utils.malloc import tune_host_allocator
    tune_host_allocator()
    parser = argparse.ArgumentParser(
        prog="locityper-tpu",
        description="TPU-native targeted genotyper (Locityper method)")
    sub = parser.add_subparsers(dest="command", required=True)

    from .commands import (add, preproc, genotype, recruit, align, prune,
                           paf_vcf, index)
    for mod, name, help_ in [
        (add, "add", "Add locus/loci to the database"),
        (preproc, "preproc", "Preprocess a WGS sample (background distributions)"),
        (genotype, "genotype", "Genotype a sample over database loci"),
        (recruit, "recruit", "Recruit reads to target sequences"),
        (align, "align", "All-vs-all haplotype alignment (PAF output)"),
        (prune, "prune", "Prune similar haplotypes from the database"),
        (paf_vcf, "paf-vcf", "Convert haplotype PAF alignments to VCF"),
        (index, "index", "Index a coordinate-sorted BAM (.bai)"),
    ]:
        p = sub.add_parser(name, help=help_)
        mod.add_args(p)
        p.set_defaults(func=mod.run)

    args = parser.parse_args(argv)
    try:
        return args.func(args)
    except (ValueError, OSError) as e:
        # Clean one-line errors for user mistakes (bad inputs/paths), like
        # the reference's Error enum rendering (err.rs:11-150).  Unexpected
        # exception types still raise with a full traceback.
        import logging
        logging.getLogger("locityper").error("%s", e)
        return 1


if __name__ == "__main__":
    sys.exit(main())
