from fastvim_tpu.evals.lm_harness import (
    loglikelihood,
    loglikelihood_rolling,
    make_eval_wrapper,
)

__all__ = ["loglikelihood", "loglikelihood_rolling", "make_eval_wrapper"]
