from .taxonomy import Taxonomy, RANKS, rank_id, rank_string
