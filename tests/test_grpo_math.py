"""GRPO loss math parity vs the reference formulas (torch autograd oracle).

The torch code below re-states SG_RLVR_trainer.py:551-643 line-for-line as a
test oracle; we compare loss values AND gradients w.r.t. per-token logps.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from spacer_tpu.train import (
    group_advantages,
    grpo_loss,
    length_control_bonus,
    temporal_bonus,
)


def torch_reference_loss(pol, ref, rewards, mask, num_generations, beta):
    pol = torch.tensor(pol, requires_grad=True)
    ref_t = torch.tensor(ref)
    rewards_t = torch.tensor(rewards)
    mask_t = torch.tensor(mask, dtype=torch.float32)

    x = torch.clamp(ref_t - pol, min=-10, max=10)
    per_token_kl = torch.exp(x) - x - 1

    mean_g = rewards_t.view(-1, num_generations).mean(dim=1)
    std_g = rewards_t.view(-1, num_generations).std(dim=1)
    mean_g = mean_g.repeat_interleave(num_generations, dim=0)
    std_g = std_g.repeat_interleave(num_generations, dim=0)
    advantages = (rewards_t - mean_g) / (std_g + 1e-4)

    per_token_loss = torch.exp(pol - pol.detach()) * advantages.unsqueeze(1)
    per_token_loss = -(per_token_loss - beta * per_token_kl)
    loss = ((per_token_loss * mask_t).sum(dim=1) / mask_t.sum(dim=1)).mean()
    loss.backward()
    return loss.item(), pol.grad.numpy(), advantages.numpy()


def test_loss_and_grad_parity():
    rng = np.random.default_rng(0)
    N, C, G = 8, 16, 4
    pol = rng.normal(-2, 1, size=(N, C)).astype(np.float32)
    ref = rng.normal(-2, 1, size=(N, C)).astype(np.float32)
    rewards = rng.uniform(0, 2, size=(N,)).astype(np.float32)
    mask = (rng.uniform(size=(N, C)) > 0.3).astype(np.int32)
    mask[:, 0] = 1
    beta = 0.04

    t_loss, t_grad, t_adv = torch_reference_loss(pol, ref, rewards, mask, G, beta)

    adv = group_advantages(jnp.asarray(rewards), G)
    np.testing.assert_allclose(np.asarray(adv), t_adv, rtol=1e-5, atol=1e-6)

    def f(pol_j):
        loss, _ = grpo_loss(pol_j, jnp.asarray(ref), adv, jnp.asarray(mask), beta)
        return loss

    j_loss, j_grad = jax.value_and_grad(f)(jnp.asarray(pol))
    np.testing.assert_allclose(float(j_loss), t_loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_grad), t_grad, rtol=1e-4, atol=1e-6)


def test_kl_clamp_active():
    # large logp gaps hit the +-10 clamp
    pol = jnp.full((2, 4), -30.0)
    ref = jnp.zeros((2, 4))
    adv = jnp.zeros((2,))
    mask = jnp.ones((2, 4), jnp.int32)
    loss, metrics = grpo_loss(pol, ref, adv, mask, beta=1.0)
    expected_kl = np.exp(10.0) - 10.0 - 1.0
    np.testing.assert_allclose(float(metrics["kl"]), expected_kl, rtol=1e-6 * 100)


def test_temporal_bonus():
    r = np.array([[0.05, 1.0], [0.9, 1.0], [0.5, 0.0], [0.0, 0.0]])
    shuffled = np.array([[0.2, 1.0], [0.3, 1.0]])
    # acc_mean = 0.3625 >= 0.8 * 0.25 -> bonus applies to rows with acc > 0.1
    out, flag = temporal_bonus(r, shuffled)
    assert flag == 1.0
    np.testing.assert_allclose(out[:, 0], [0.05, 1.2, 0.8, 0.0])
    # stricter shuffled accuracy -> no bonus
    shuffled2 = np.array([[0.9, 1.0], [0.9, 1.0]])
    out2, flag2 = temporal_bonus(r, shuffled2)
    assert flag2 == 0.0
    np.testing.assert_allclose(out2, r)


def test_length_control_bonus():
    rewards = np.array([1.0, 1.5, 0.2, 1.0])
    acc = np.array([0.9, 0.8, 0.05, 0.9])
    lengths = np.array([100, 400, 400, 512])
    out = length_control_bonus(rewards, acc, lengths)
    np.testing.assert_allclose(out, [1.0, 1.7, 0.2, 1.2])
    # only one correct -> no bonus at all
    acc2 = np.array([0.9, 0.05, 0.05, 0.05])
    out2 = length_control_bonus(rewards, acc2, lengths)
    np.testing.assert_allclose(out2, rewards)


def test_beta_zero_skips_reference():
    """beta == 0 drops the KL term entirely (TRL GRPOConfig beta=0: no ref
    model) — grpo_loss accepts ref=None with identical loss/grads to a
    beta=0 call with any ref tensor."""
    rng = np.random.default_rng(3)
    pol = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    adv = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    mask = jnp.ones((4, 8), jnp.int32)

    def loss_with(refv):
        return grpo_loss(pol, refv, adv, mask, beta=0.0)[0]

    l_none, g_none = jax.value_and_grad(
        lambda p: grpo_loss(p, None, adv, mask, beta=0.0)[0])(pol)
    l_ref, g_ref = jax.value_and_grad(
        lambda p: grpo_loss(p, ref, adv, mask, beta=0.0)[0])(pol)
    np.testing.assert_allclose(float(l_none), float(l_ref), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(g_none), np.asarray(g_ref),
                               rtol=1e-7)
    _, metrics = grpo_loss(pol, None, adv, mask, beta=0.0)
    assert float(metrics["kl"]) == 0.0
    with pytest.raises(AssertionError):
        grpo_loss(pol, None, adv, mask, beta=0.04)
