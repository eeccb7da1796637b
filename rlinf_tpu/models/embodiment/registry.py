"""Registers every policy family under its reference name.

Reference analog: ``SupportedModel`` registration + ``get_model`` dispatch
(reference rlinf/models/__init__.py:274,26, rlinf/config.py:43). The
reference ships ~20 named policy families (SURVEY.md §2.6); here each name
maps onto one of this framework's four VLA architectures (or the small
policies), configured with that family's geometry:

  * flow-matching VLM-prefix + action-expert (``Pi0Policy``):
    openpi pi0 / pi0.5, and the pi0-derived families — lingbotvla
    (reference rlinf/models/embodiment/lingbotvla, a pi0-style flow VLA),
    dexbotic pi (reference dexbotic, pi-series policy).
  * discrete action-bin AR decode (``OpenVLAPolicy``): openvla.
  * parallel-decode continuous chunks (``VLAPolicy``): openvla_oft (the OFT
    recipe), abot_m0 (reference abot_m0, chunked continuous-action VLA).
  * DiT flow head over backbone features (``GR00TPolicy``): gr00t N1.5/1.6,
    starvla (flowmatching action head, ``num_embodiments=1``), dexbotic DM0
    (diffusion/flow action model).

Every factory takes keyword overrides so entry scripts can set real
geometry; defaults are test-scale. Pretrained-weight import for the LLM
trunks goes through ``models/llm/hf_import.py``.
"""

from __future__ import annotations

from rlinf_tpu.models import register_model
from rlinf_tpu.models.embodiment.cnn_policy import CNNGaussianPolicy
from rlinf_tpu.models.embodiment.flow_policy import FlowMatchingPolicy
from rlinf_tpu.models.embodiment.gr00t import GR00TConfig, GR00TPolicy
from rlinf_tpu.models.embodiment.mlp_policy import MLPGaussianPolicy
from rlinf_tpu.models.embodiment.openpi import Pi0Config, Pi0Policy
from rlinf_tpu.models.embodiment.openvla import OpenVLAConfig, OpenVLAPolicy
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.models.embodiment.vla_policy import VLAPolicy


@register_model("mlp_policy")
def _mlp(**kw):
    return MLPGaussianPolicy(**kw)


@register_model("cnn_policy")
def _cnn(**kw):
    return CNNGaussianPolicy(**kw)


@register_model("sac_policy")
def _sac(**kw):
    return MLPSACPolicy(**kw)


@register_model("flow_policy")
def _flow(**kw):
    """SAC-flow style MLP flow policy (reference flow_policy, 633 LoC)."""
    return FlowMatchingPolicy(**kw)


@register_model("openpi_pi0")
def _pi0(cfg: Pi0Config = None, **kw):
    return Pi0Policy(cfg or Pi0Config(**kw))


@register_model("openpi_pi05")
def _pi05(cfg: Pi0Config = None, **kw):
    kw.setdefault("discrete_state", True)
    return Pi0Policy(cfg or Pi0Config(**kw))


@register_model("lingbotvla")
def _lingbot(cfg: Pi0Config = None, **kw):
    """pi0-style flow VLA (reference lingbotvla, 1,158 LoC)."""
    return Pi0Policy(cfg or Pi0Config(**kw))


@register_model("dexbotic_pi")
def _dexbotic_pi(cfg: Pi0Config = None, **kw):
    """Dexbotic pi-series flow VLA (reference dexbotic, 1,747 LoC)."""
    return Pi0Policy(cfg or Pi0Config(**kw))


@register_model("openvla")
def _openvla(cfg: OpenVLAConfig = None, **kw):
    return OpenVLAPolicy(cfg or OpenVLAConfig(**kw))


@register_model("openvla_oft")
def _openvla_oft(**kw):
    """OFT recipe: parallel decode, continuous chunks (reference
    openvla_oft, 1.9k LoC)."""
    return VLAPolicy(**kw)


@register_model("abot_m0")
def _abot(**kw):
    """Chunked continuous-action VLA (reference abot_m0, 745 LoC)."""
    return VLAPolicy(**kw)


@register_model("gr00t")
def _gr00t(cfg: GR00TConfig = None, **kw):
    return GR00TPolicy(cfg or GR00TConfig(**kw))


@register_model("starvla")
def _starvla(cfg: GR00TConfig = None, **kw):
    """Flow-matching action head, single embodiment (reference
    starvla/action_heads/flowmatching.py, 788 LoC)."""
    kw.setdefault("num_embodiments", 1)
    return GR00TPolicy(cfg or GR00TConfig(**kw))


@register_model("dexbotic_dm0")
def _dm0(cfg: GR00TConfig = None, **kw):
    """Diffusion/flow action model head (reference dexbotic DM0)."""
    return GR00TPolicy(cfg or GR00TConfig(**kw))


@register_model("recap_critic")
def _recap(vcfg=None, **kw):
    """RECAP categorical value critic (reference
    value_model/recap/modeling_critic.py:129, 1,099 LoC)."""
    from rlinf_tpu.models.embodiment.value_critic import (
        ValueCriticConfig, ValueCriticPolicy,
    )

    return ValueCriticPolicy(vcfg or ValueCriticConfig(), **kw)


@register_model("steam_critic")
def _steam(cfg=None, **kw):
    """STEAM pairwise stride ensemble critic (reference
    value_model/steam/modeling_steam.py + ensemble_modeling_critic.py)."""
    from rlinf_tpu.models.embodiment.value_critic import (
        SteamConfig, SteamCritic,
    )

    return SteamCritic(cfg or SteamConfig(**kw))
