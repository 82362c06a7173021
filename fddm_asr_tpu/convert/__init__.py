from fddm_asr_tpu.convert.torch_ckpt import (
    decoder_params_from_state_dict,
    decoder_state_dict_from_params,
    load_reference_checkpoint,
    projection_params_from_state_dict,
    save_reference_checkpoint,
)

__all__ = [
    "decoder_params_from_state_dict",
    "decoder_state_dict_from_params",
    "load_reference_checkpoint",
    "projection_params_from_state_dict",
    "save_reference_checkpoint",
]
