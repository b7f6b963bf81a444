from odoo_batch_processing_spark.sources.loader import (  # noqa: F401
    DEFAULT_SF_DIR,
    load_all,
    load_table,
    register_views,
)
