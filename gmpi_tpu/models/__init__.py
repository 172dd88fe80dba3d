from gmpi_tpu.models.discriminator import DiscriminatorCfg
from gmpi_tpu.models.generator import GeneratorCfg, MappingNetwork, SynthesisNetworkCfg

__all__ = ["DiscriminatorCfg", "GeneratorCfg", "MappingNetwork", "SynthesisNetworkCfg"]
