"""Phylogeny engine: models, trees, likelihood, placement."""

from .models import (GTR, HKY85, JC69, K80, TN93, F81, SubModel,
                     create_model, load_model, save_model)
from .dgamma import DiscreteGammaModel
from .newick import NewickNode, parse_newick, write_newick
from .tree import (PTLoc, PTPlacement, PTUnrooted, PLACEMENT_TSV_HEADER,
                   dot_product_scaled, dot_product_scaled_vec,
                   estimate_branch_length, format_taxon_name, infer_state,
                   infer_weight, is_canonical_name, is_full_canonical_name,
                   is_partial_canonical_name, optimize_placement, p_dist,
                   row_mean_exp_scaled)

__all__ = [
    "SubModel", "JC69", "K80", "F81", "HKY85", "TN93", "GTR",
    "create_model", "load_model", "save_model",
    "DiscreteGammaModel", "NewickNode", "parse_newick", "write_newick",
    "PTUnrooted", "PTLoc", "PTPlacement", "PLACEMENT_TSV_HEADER",
    "p_dist", "infer_state", "infer_weight", "format_taxon_name",
    "is_canonical_name", "is_full_canonical_name",
    "is_partial_canonical_name", "dot_product_scaled",
    "dot_product_scaled_vec", "row_mean_exp_scaled",
    "estimate_branch_length", "optimize_placement",
]
