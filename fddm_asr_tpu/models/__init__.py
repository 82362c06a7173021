from fddm_asr_tpu.models.decoder import DenoisingTransformerDecoder
from fddm_asr_tpu.models.projection import MLP, SpeechProjector, TextEmbedding, TextProjector

__all__ = [
    "DenoisingTransformerDecoder",
    "MLP",
    "SpeechProjector",
    "TextEmbedding",
    "TextProjector",
]
