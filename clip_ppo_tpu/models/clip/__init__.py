from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS, CLIPConfig
from clip_ppo_tpu.models.clip.loader import (
    convert_hf_state_dict,
    convert_openai_state_dict,
    find_checkpoint,
    load_clip_model,
    load_openai_checkpoint,
)
from clip_ppo_tpu.models.clip.model import (
    encode_image,
    encode_text,
    init_clip_params,
    normalize,
)
from clip_ppo_tpu.models.clip.tokenizer import (
    BPETokenizer,
    HashTokenizer,
    get_tokenizer,
    tokenize,
)

__all__ = [
    "CLIP_CONFIGS",
    "CLIPConfig",
    "BPETokenizer",
    "HashTokenizer",
    "convert_hf_state_dict",
    "convert_openai_state_dict",
    "encode_image",
    "encode_text",
    "find_checkpoint",
    "get_tokenizer",
    "init_clip_params",
    "load_clip_model",
    "load_openai_checkpoint",
    "normalize",
    "tokenize",
]
