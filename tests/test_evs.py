"""EVS video token pruning (reference analog: srt/multimodal/evs/
evs_core.py): retention-mask properties + engine e2e with pruned video."""

import numpy as np

from sglang_diffusion_tpu.multimodal.evs import (
    compute_retained_tokens_count,
    compute_retention_mask,
)


def test_retained_count_floor():
    assert compute_retained_tokens_count(16, 4, 0.99) == 16  # first frame
    assert compute_retained_tokens_count(16, 4, 0.5) == 32
    assert compute_retained_tokens_count(16, 4, 0.0) == 64


def test_first_frame_always_retained_and_static_pruned():
    rng = np.random.default_rng(0)
    t, lh, lw, e = 4, 2, 2, 8
    frame = rng.standard_normal((lh, lw, e)).astype(np.float32)
    # frames 0..2 identical, frame 3 different
    vid = np.stack([frame, frame, frame,
                    rng.standard_normal((lh, lw, e)).astype(np.float32)])
    mask = compute_retention_mask(vid.reshape(-1, e), (t, lh, lw), q=0.5)
    m = mask.reshape(t, lh, lw)
    assert m[0].all()  # first frame fully kept
    assert m[3].all()  # changed frame kept (max dissimilarity)
    assert not m[1].any() and not m[2].any()  # static repeats pruned
    assert mask.sum() == compute_retained_tokens_count(lh * lw, t, 0.5)


def test_engine_video_evs_prunes_prompt():
    from tests.test_qwen2_vl_e2e import _cfg
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = _cfg()
    cfg.video_token_id = 401

    def make(q):
        args = ServerArgs(
            model_path="", tokenizer_path="byte", page_size=8,
            max_total_tokens=4096, attention_backend="xla",
            context_length=512, video_pruning_rate=q,
        )
        return Engine(server_args=args, model_config=cfg,
                      tokenizer=ByteTokenizer())

    rng = np.random.default_rng(0)
    # static video: all frames identical -> heavy pruning possible
    frame = rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)
    frames = np.stack([frame] * 8)  # 8 frames -> 4 temporal groups
    ids = [ord(c) for c in "video "] + [401]
    sp = SamplingParams(temperature=0.0, max_new_tokens=4)

    full = make(0.0).generate(input_ids=ids, sampling_params=sp,
                              video_data=frames)
    pruned_eng = make(0.75)
    pruned = pruned_eng.generate(input_ids=ids, sampling_params=sp,
                                 video_data=frames)
    # 4 groups x 4 merged tokens = 16 -> floor at one frame group (4)
    assert full["meta_info"]["prompt_tokens"] == len(ids) - 1 + 16
    assert pruned["meta_info"]["prompt_tokens"] == len(ids) - 1 + 4
    # deterministic under pruning
    again = pruned_eng.generate(input_ids=ids, sampling_params=sp,
                                video_data=frames)
    assert pruned["output_ids"] == again["output_ids"]
