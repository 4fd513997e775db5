from sglang_diffusion_tpu.eval.simple_evals import (  # noqa: F401
    EvalResult,
    GSM8KEval,
    MMLUEval,
    MGSMEval,
    get_eval,
    run_eval,
)
