from tpu_rt.bench.cli import main, run_benchmark

__all__ = ["main", "run_benchmark"]
