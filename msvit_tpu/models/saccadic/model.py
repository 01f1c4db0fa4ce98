"""Saccadic top-level model: the serial saccade controller.

The reference's `SaccadicViTModel.forward` is an unfinished sketch
(`modeling_scvitencoder.py:348-487` — the module does not even import
upstream, SURVEY §2.6); this implements the documented semantics from
`design.txt` and that sketch as a **host-side driver around jitted
match / refine / embed steps** (the structure SURVEY §7.7 prescribes —
the loop is data-dependent and serial by design, so it lives in Python
while every tensor op is a fixed-shape jitted function):

per step (one glimpse):
  1. pop (proposing_edge, predicted_embedding) from the queue; decode the
     next query from the predicted embedding via the position decoder, or
     start at the image center (sketch `:385-389`);
  2. embed the glimpse at the query (`:395`);
  3. beam-match the pattern bank against [new node ++ converged history]
     with ≤1 wildcard (design.txt: wildcard-count-stratified beams; the
     one-wildcard matches are the *predictive edges* proposing where to
     look next);
  4. refine the new node's embedding with the transformer refiner over
     the matched pattern tokens;
  5. convergence test: if the saccade revisits itself (spatial or latent
     min-distance below threshold, `:365-368,:430`) or hits max length,
     the node is *terminal*: the proposing edge's wildcard is bound to it
     (`:443-445`) and the queued predictive edges branch the search
     (`:447-449`); if it instead lands near a *historic* node, a loop
     closure binds to that node's terminal index (`:433-435`).

Static shapes: the history context fed to the jitted matcher is padded to
`max_trace_length` with far-sentinel embeddings whose log-pdf is ≈ −∞, so
the beam never binds them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.models.saccadic.config import SaccadicViTConfig
from msvit_tpu.models.saccadic.embeddings import SaccadicViTEmbeddings
from msvit_tpu.models.saccadic.pattern import (
    WILDCARD,
    SaccadicViTMultiStatePattern,
)
from msvit_tpu.models.saccadic.refiner import TransformerSaccadicViTPredictor

_SENTINEL = 1e6  # far-away pad embedding: log-pdf ≈ −∞ under any pattern


@dataclasses.dataclass
class Edge:
    """A pattern instance over saccade nodes (sketch `:352-355`)."""

    complexity: int
    pattern_index: int
    node_indices: np.ndarray  # [K]; −1 = wildcard (unexplored)
    joint_log_pdf: float


class SaccadicViTModel:
    """Host-side saccade controller.  Not a flax module: the loop is
    data-dependent; submodule params live in one variables dict."""

    def __init__(self, config: SaccadicViTConfig):
        self.config = config
        self.embeddings = SaccadicViTEmbeddings(config)
        self.pattern = SaccadicViTMultiStatePattern(config)
        self.predictor = TransformerSaccadicViTPredictor(config)
        self._jitted: Dict[str, Any] = {}

    # ---------------- init ----------------

    def init(self, rng: jax.Array, pixel_values: jnp.ndarray) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(rng, 3)
        dof = self.config.dof
        d = self.config.hidden_size
        query = jnp.zeros((1, dof))
        emb_vars = self.embeddings.init(k1, pixel_values[:1], query)
        pat_vars = self.pattern.init(
            k2, jnp.zeros((1, 1, d)), jnp.zeros((1, 2, d)), 1
        )
        patterns = self.pattern.apply(
            pat_vars, jnp.zeros((1, 1, d)), jnp.zeros((1, 2, d)), 1
        )
        prd_vars = self.predictor.init(
            k3, jnp.zeros((1, 1, d)), jnp.zeros((1, 2, d)), patterns
        )
        return {
            "embeddings": emb_vars,
            "pattern": pat_vars,
            "predictor": prd_vars,
        }

    # ---------------- jitted steps ----------------

    def _steps(self):
        if self._jitted:
            return self._jitted
        cfg = self.config

        @jax.jit
        def embed(variables, pixel_values, query):
            # pixel [1,H,W,C], query [dof] -> [D]
            return self.embeddings.apply(
                variables["embeddings"], pixel_values, query[None]
            )[0].astype(jnp.float32)

        @jax.jit
        def decode(variables, embedding):
            return self.embeddings.apply(
                variables["embeddings"],
                embedding,
                method=SaccadicViTEmbeddings.decode_position,
            )

        @jax.jit
        def match_refine(variables, hidden, context):
            # hidden [1,D]; context [C_pad,D] (sentinel-padded)
            patterns = self.pattern.apply(
                variables["pattern"], hidden[None], context[None], 1
            )
            refined, _ = self.predictor.apply(
                variables["predictor"], hidden[None], context[None], patterns
            )
            return patterns, refined[0, 0]

        self._jitted = {
            "embed": embed,
            "decode": decode,
            "match_refine": match_refine,
        }
        return self._jitted

    # ---------------- controller ----------------

    def forward(
        self,
        variables: Dict[str, Any],
        pixel_values: jnp.ndarray,  # [1, H, W, C] — one image (serial model)
        convergence_distance: str = "spatial",
        absolute_threshold: float = 0.1,
        max_trace_length: int = 16,
        max_saccade_length: int = 6,
        max_proposals: int = 2,
    ) -> Dict[str, Any]:
        cfg = self.config
        steps = self._steps()
        d = cfg.hidden_size
        c_pad = max_trace_length

        history: List[Dict[str, np.ndarray]] = []  # converged nodes
        saccade: List[Dict[str, np.ndarray]] = []  # current saccade window
        terminal_indices: List[int] = []
        constructed_edges: List[Edge] = []

        queue: List[Tuple[Optional[Edge], Optional[np.ndarray]]] = [(None, None)]
        proposed_edges: List[Tuple[Edge, np.ndarray]] = []

        def context_array() -> jnp.ndarray:
            ctx = np.full((c_pad, d), _SENTINEL, np.float32)
            for i, t in enumerate(history[:c_pad]):
                ctx[i] = t["embedding"]
            return jnp.asarray(ctx)

        def min_distance(timestep, window):
            key = "query" if convergence_distance == "spatial" else "embedding"
            dists = [
                float(np.linalg.norm(timestep[key] - w[key])) for w in window
            ]
            i = int(np.argmin(dists))
            return dists[i], i

        it = 0
        while it < max_trace_length and queue:
            proposing_edge, predicted_embedding = queue.pop(0)
            if predicted_embedding is None:
                next_query = np.zeros((cfg.dof,), np.float32)
            else:
                next_query = np.asarray(
                    steps["decode"](variables, jnp.asarray(predicted_embedding))
                )

            embedding = np.asarray(
                steps["embed"](variables, pixel_values, jnp.asarray(next_query))
            )

            patterns, refined = steps["match_refine"](
                variables, jnp.asarray(embedding)[None], context_array()
            )
            refined = np.asarray(refined)

            # predictive edges: one-wildcard matches, best-first
            step_proposals: List[Tuple[Edge, np.ndarray]] = []
            for (k, n_wild), p in patterns.items():
                if n_wild != 1:
                    continue
                joint = np.asarray(p["joint_log_pdf"][0])
                order = np.argsort(-joint)[:max_proposals]
                for w in order:
                    edge = Edge(
                        complexity=k,
                        pattern_index=int(p["pattern_index"][0, w]),
                        node_indices=np.asarray(p["node_indices"][0, w]),
                        joint_log_pdf=float(joint[w]),
                    )
                    pred = np.asarray(p["conditional_mean"][0, w, 0])
                    step_proposals.append((edge, pred))
            step_proposals.sort(key=lambda e: -e[0].joint_log_pdf)

            timestep = {
                "predicted_embedding": (
                    predicted_embedding
                    if predicted_embedding is not None
                    else np.zeros((d,), np.float32)
                ),
                "query": next_query,
                "embedding": refined,
                "raw_embedding": embedding,
            }
            saccade.append(timestep)

            # convergence / loop closure (sketch `:428-449`)
            terminal_index: Optional[int] = None
            if len(saccade) == max_saccade_length or (
                len(saccade) > 1
                and min_distance(timestep, saccade[:-1])[0] < absolute_threshold
            ):
                terminal_index = len(history) + len(saccade) - 1
            elif history:
                dist, idx = min_distance(timestep, history)
                if dist < absolute_threshold:
                    terminal_index = int(history[idx]["terminal_index"])

            if terminal_index is not None:
                for t in saccade:
                    t["terminal_index"] = np.asarray(terminal_index)
                history.extend(saccade)
                saccade = []

                if proposing_edge is not None:
                    unfilled = proposing_edge.node_indices == WILDCARD
                    if unfilled.sum() == 1:
                        proposing_edge.node_indices = np.where(
                            unfilled, terminal_index, proposing_edge.node_indices
                        )
                        constructed_edges.append(proposing_edge)

                if terminal_index not in terminal_indices:
                    terminal_indices.append(terminal_index)
                    queue = step_proposals + queue
            else:
                # continue the saccade along the most likely predictive edge
                if step_proposals:
                    queue.insert(0, step_proposals[0])

            proposed_edges = step_proposals
            it += 1

        trace = history + saccade
        return {
            "trace": {
                k: np.stack([t[k] for t in trace])
                for k in (
                    "query",
                    "embedding",
                    "raw_embedding",
                    "predicted_embedding",
                )
            }
            if trace
            else {},
            "terminal_indices": terminal_indices,
            "constructed_edges": constructed_edges,
            "num_steps": it,
            "proposed_edges": proposed_edges,
        }
