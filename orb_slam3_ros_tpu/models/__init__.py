"""Pipeline layer: map state, tracking, local mapping, system facade."""
