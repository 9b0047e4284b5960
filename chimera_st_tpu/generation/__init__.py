from .beam_search import BeamState, beam_search

__all__ = ["BeamState", "beam_search"]
