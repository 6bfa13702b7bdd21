from karanta_tpu.utils.metrics import MetricsKeeper, WorkerTracker  # noqa: F401
from karanta_tpu.utils.timing import timeit  # noqa: F401
