"""Training: GRPO / SG-RLVR / SFT steps, optimizer, trainer loop.

Behavioral reference: SG_RLVR_trainer.py compute_loss (:384-686) — group
advantages, k3 KL to a frozen reference policy, temporal/length bonuses —
re-expressed as one SPMD train step over the mesh (no DeepSpeed, no rank0
generate/broadcast: the sampler shares params with the train step).
"""

from spacer_tpu.train.grpo import (
    grpo_loss,
    group_advantages,
    per_token_logps_from_logits,
    temporal_bonus,
    length_control_bonus,
)
from spacer_tpu.train.optimizer import make_optimizer

__all__ = [
    "grpo_loss", "group_advantages", "per_token_logps_from_logits",
    "temporal_bonus", "length_control_bonus", "make_optimizer",
]
