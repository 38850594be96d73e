from robust_e2e_gan_tpu.decode.beam import (
    BeamResult,
    batched_prefix_scores,
    beam_search_from_encoder,
    make_beam_searcher,
    make_chunked_pipelined_beam_searcher,
    make_pipelined_beam_searcher,
    serving_schedule_default,
)
from robust_e2e_gan_tpu.decode.ctc_prefix import CTCPrefixScore
from robust_e2e_gan_tpu.decode.host_reference import recognize_beam_host

__all__ = [
    "BeamResult",
    "batched_prefix_scores",
    "beam_search_from_encoder",
    "make_beam_searcher",
    "make_chunked_pipelined_beam_searcher",
    "make_pipelined_beam_searcher",
    "serving_schedule_default",
    "CTCPrefixScore",
    "recognize_beam_host",
]
