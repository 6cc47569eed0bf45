from sprc_tpu.models.qformer import QFormer, QFormerConfig
from sprc_tpu.models.vit import EvaViT, ClipViT, eva_vit_g_config, clip_vit_l_config

# registering model classes happens on import
from sprc_tpu.models import cir_align_prompt as _cir_align_prompt  # noqa: F401
from sprc_tpu.models import cir_variants as _cir_variants  # noqa: F401
from sprc_tpu.models import instruct_cir as _instruct_cir  # noqa: F401
from sprc_tpu.models import blip2_stage1 as _blip2_stage1  # noqa: F401
from sprc_tpu.models import blip2_opt as _blip2_opt  # noqa: F401
from sprc_tpu.models import blip2_t5 as _blip2_t5  # noqa: F401
from sprc_tpu.models import blip1 as _blip1  # noqa: F401
from sprc_tpu.models import clip as _clip  # noqa: F401
from sprc_tpu.models import albef as _albef  # noqa: F401
from sprc_tpu.models import gpt_dialogue as _gpt_dialogue  # noqa: F401
from sprc_tpu.models import classification as _classification  # noqa: F401
from sprc_tpu.models import nlvr as _nlvr  # noqa: F401
from sprc_tpu.models import vqa as _vqa  # noqa: F401
from sprc_tpu.models import alpro as _alpro  # noqa: F401
from sprc_tpu.models import pnp_vqa as _pnp_vqa  # noqa: F401

__all__ = [
    "QFormer",
    "QFormerConfig",
    "EvaViT",
    "ClipViT",
    "eva_vit_g_config",
    "clip_vit_l_config",
]
