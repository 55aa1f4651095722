from wolf_quake_spark.plans.checkpoint import BatchRecord, Manifest, plan_batches  # noqa: F401
from wolf_quake_spark.plans.compact import compact_dir  # noqa: F401
from wolf_quake_spark.plans.checkpoint import read_as_of  # noqa: F401
from wolf_quake_spark.plans.incremental import read_view, refresh_mod_totals  # noqa: F401
from wolf_quake_spark.plans.pipeline import run_batch, run_resumable  # noqa: F401
