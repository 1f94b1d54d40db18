"""Provider-style ETL pipelines: declarative DataFrame DAGs from source
scan to envelope sink, mirroring the reference's provider model
(/root/reference/src/vunnel/provider.py:115-180) as pure functions.
"""

from vunnel_spark.pipelines.nvd import nvd_pipeline  # noqa: F401
from vunnel_spark.pipelines.osv import osv_patch_fix_dates  # noqa: F401
from vunnel_spark.pipelines.rhel import rhel_pipeline  # noqa: F401
from vunnel_spark.pipelines.secdb import secdb_pipeline  # noqa: F401
from vunnel_spark.pipelines.ubuntu import ubuntu_pipeline  # noqa: F401
