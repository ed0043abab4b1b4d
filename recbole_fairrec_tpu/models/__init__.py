from .base import AbstractRecommender, FairRecommender

__all__ = ["AbstractRecommender", "FairRecommender"]
