from diffusionsat_tpu.models.query_sat import (
    QuerySATConfig,
    query_sat_init,
    query_sat_apply,
)
from diffusionsat_tpu.models.query_sat_lit import (
    QuerySATLitConfig,
    query_sat_lit_init,
    query_sat_lit_apply,
)
from diffusionsat_tpu.models.neuro_sat import (
    NeuroSATConfig,
    neuro_sat_init,
    neuro_sat_apply,
)
from diffusionsat_tpu.models.neurocore import (
    NeuroCoreConfig,
    neurocore_init,
    neurocore_apply,
)
from diffusionsat_tpu.models.attention_sat import (
    AttentionSATConfig,
    attention_sat_init,
    attention_sat_apply,
)
from diffusionsat_tpu.models.anf_sat import (
    ANFSATConfig,
    anf_sat_init,
    anf_sat_apply,
)
