from fddm_asr_tpu.data.audio_io import load_wav, save_wav, resample
from fddm_asr_tpu.data.dataset import ManifestDataset, make_batches
from fddm_asr_tpu.data.text import normalize_text

__all__ = [
    "load_wav",
    "save_wav",
    "resample",
    "ManifestDataset",
    "make_batches",
    "normalize_text",
]
