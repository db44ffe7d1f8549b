from . import (  # noqa: F401
    customer_feedback,
    delivery_performance,
    inventory_recon,
    marketing_roi,
    sales_revenue,
)
