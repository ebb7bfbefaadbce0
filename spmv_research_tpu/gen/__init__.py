from .artificial import (
    ArtificialParams, artificial_matrix_generation, generate_from_line,
)
