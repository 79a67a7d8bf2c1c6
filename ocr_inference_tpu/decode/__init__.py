"""CTC decoding (device greedy, host beam search) and n-gram LM rescoring."""

from ocr_inference_tpu.decode.arpa_lm import ArpaLM  # noqa: F401
from ocr_inference_tpu.decode.ctc import (  # noqa: F401
    Beam,
    beam_search,
    greedy_decode,
    ids_to_tokens,
)
from ocr_inference_tpu.decode.decoder import CTCDecoder  # noqa: F401
