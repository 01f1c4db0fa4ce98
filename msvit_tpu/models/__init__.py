"""Encoder zoo: five ViT encoder families + the clustering module,
mirroring the reference's `model/` package
(`model/{base,multistate,predictive,saccadic,subsample}_encoder`,
`model/clustering`) with TPU-first implementations."""
