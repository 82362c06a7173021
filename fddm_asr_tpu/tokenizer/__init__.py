from fddm_asr_tpu.tokenizer.spm import SentencePieceProcessor, load_tokenizer

__all__ = ["SentencePieceProcessor", "load_tokenizer"]
