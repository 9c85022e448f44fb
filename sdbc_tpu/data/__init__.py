from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.data import templates

__all__ = ["CLIPTokenizer", "templates"]
