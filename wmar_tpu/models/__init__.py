"""Model frontends: Taming GPT, RAR, VQGAN tokenizers, ARMM wrappers."""

from wmar_tpu.models.armm import ARMMWrapper, GenParams, RarARMM, TamingARMM
from wmar_tpu.models.chameleon import (
    ChameleonARMM,
    ChameleonVocab,
    ImageCFGOptions,
    build_cfg_prompts,
)
from wmar_tpu.models.llama import CHAMELEON_7B, LlamaConfig, init_llama_params, llama_forward, llama_tp_specs
from wmar_tpu.models.maskgit_vqgan import MASKGIT_IMAGENET_F16, MaskGitVQConfig, MaskGitVQGAN
from wmar_tpu.models.rar import RARConfig, RARSampler, init_rar_params, rar_config
from wmar_tpu.models.taming_gpt import GPTConfig, gpt_forward, init_gpt_params
from wmar_tpu.models.vqgan import (
    CHAMELEON_F16,
    TAMING_IMAGENET_F16,
    TamingVQGAN,
    VQGANConfig,
)

__all__ = [
    "ARMMWrapper",
    "CHAMELEON_7B",
    "CHAMELEON_F16",
    "ChameleonARMM",
    "ChameleonVocab",
    "ImageCFGOptions",
    "LlamaConfig",
    "build_cfg_prompts",
    "init_llama_params",
    "llama_forward",
    "llama_tp_specs",
    "GPTConfig",
    "GenParams",
    "MASKGIT_IMAGENET_F16",
    "MaskGitVQConfig",
    "MaskGitVQGAN",
    "RARConfig",
    "RARSampler",
    "RarARMM",
    "TAMING_IMAGENET_F16",
    "TamingARMM",
    "TamingVQGAN",
    "VQGANConfig",
    "gpt_forward",
    "init_gpt_params",
    "init_rar_params",
    "rar_config",
]
