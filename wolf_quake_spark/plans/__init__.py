from wolf_quake_spark.plans.checkpoint import BatchRecord, Manifest, plan_batches  # noqa: F401
from wolf_quake_spark.plans.pipeline import run_batch, run_resumable  # noqa: F401
