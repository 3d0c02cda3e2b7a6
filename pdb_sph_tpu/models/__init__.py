from .scenes import spawn, standard, dam_break, blowup, SCENE_FNS

__all__ = ["spawn", "standard", "dam_break", "blowup", "SCENE_FNS"]
