from animals3d_tpu.models.animal import AnimalModel, AnimalModelConfig


def build_model(cfg: dict):
    """Model factory (reference `model/__init__.py:6-14`): dispatch on
    cfg['name'] ∈ {MagicPony, Fauna, Ponymation}."""
    name = cfg.get("name", "MagicPony")
    if name == "MagicPony":
        from animals3d_tpu.models.magicpony import MagicPony
        return MagicPony(cfg)
    if name == "Fauna":
        from animals3d_tpu.models.fauna import Fauna
        return Fauna(cfg)
    if name == "Ponymation":
        from animals3d_tpu.models.ponymation import Ponymation
        return Ponymation(cfg)
    raise NotImplementedError(name)
