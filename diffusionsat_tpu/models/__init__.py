from diffusionsat_tpu.models.query_sat import (
    QuerySATConfig,
    query_sat_init,
    query_sat_apply,
)
