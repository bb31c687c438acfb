"""Custom stateful streaming operators (applyInPandasWithState).

The stateless extraction stream (stream.py) needs no state; these are
the conversation-scoped prefix scans in STREAM form — the state is the
carried-in prefix summary, exactly the quantity the segmented batch
assembly (conversation.assemble_services_segmented) prefix-combines:

* ``sessionize_stream`` — 30-minute-gap sessionization, the streaming
  twin of the batch `w_sessionize` window (lag + running sum); state =
  (last event time, session counter) per conversation.
* ``inherit_category_stream`` — A4 category inheritance + A6-style
  running quantity counter (ref parser/parseDocument.js:30-52,104-114);
  state = (categoria vigente, counter) per conversation. The A5
  all-items-blank gate is inherently whole-conversation (a future turn
  can flip it) and stays a batch-side decision — the stream emits the
  raw counter so the consumer can apply the gate at finalization.

Both operators vectorize within each micro-batch group (cumsum /
ffill over the sorted pandas frame — no per-row Python beyond the
final column build) and carry state across micro-batches, so
out-of-order arrival WITHIN a batch is handled by the sort and
cross-batch ordering follows source order (file/offset order), the
same contract Spark's own flatMapGroupsWithState examples assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_SCHEMA = "conv_id STRING, turn_idx INT, session_id INT"
_SESSION_STATE = "last_epoch DOUBLE, sess INT"

CATEGORY_SCHEMA = (
    "conv_id STRING, turn_idx INT, svc_idx INT, Item STRING, Categoria STRING, "
    "Descricao STRING, Unidade INT, Quantidade STRING, qty_counter INT"
)
_CATEGORY_STATE = "vigente STRING, counter INT"


def sessionize_stream(turns: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap sessionization over a transcript stream keyed by conv_id.

    ``turns`` needs (conv_id, turn_idx, ts). Emits one row per turn with
    its session id; session ids are stable across micro-batches (state
    carries the last event time and the counter).
    """
    gap_s = float(gap_minutes) * 60.0

    def fn(key, pdfs, state):
        import pandas as pd

        (conv_id,) = key
        last_epoch, sess = state.get if state.exists else (None, 0)
        frames = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("turn_idx")
            import numpy as np

            ts = pd.to_datetime(pdf["ts"])
            epochs = ts.astype("int64").to_numpy().astype("float64") / 1e9
            # NaT → int64-min through astype; map to NaN instead so every
            # gap comparison involving a null ts is False — exactly the
            # batch twin's null semantics (ts > prev + interval is NULL →
            # flag 0), instead of a ~-9.2e9 epoch that forces a spurious
            # new session on the NEXT row and poisons the carried state
            epochs[ts.isna().to_numpy()] = np.nan

            prev = np.empty_like(epochs)
            prev[1:] = epochs[:-1]
            prev[0] = last_epoch if last_epoch is not None else -float("inf")
            flags = (epochs - prev) > gap_s
            if last_epoch is None:
                flags[0] = True
            sids = sess + flags.cumsum()
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "turn_idx": pdf["turn_idx"].to_numpy(),
                        "session_id": sids.astype("int32"),
                    }
                )
            )
            sess = int(sids[-1])
            last_epoch = float(epochs[-1])
        state.update((last_epoch, sess))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return turns.groupBy("conv_id").applyInPandasWithState(
        fn, SESSION_SCHEMA, _SESSION_STATE, "append", GroupStateTimeout.NoTimeout
    )


def inherit_category_stream(svc: DataFrame) -> DataFrame:
    """A4 category inheritance over a service-row stream: rows WITHOUT a
    quantity whose Descricao is truthy set the carried category; other
    rows inherit it (falling back to the T9 prefix rule when nothing has
    been carried yet — exactly the batch semantics). Also emits the
    running count of quantity-bearing rows (A6 numbering input).
    """

    def fn(key, pdfs, state):
        import pandas as pd

        from ..extract.document import categoria_por_prefixo

        (conv_id,) = key
        vigente, counter = state.get if state.exists else (None, 0)
        frames = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["turn_idx", "svc_idx"]).reset_index(drop=True)
            qty = pdf["Quantidade"].fillna("").astype(str).str.strip()
            has_qty = qty != ""
            desc = pdf["Descricao"]
            is_mother = (~has_qty) & desc.notna() & (desc != "")
            mothers = desc.where(is_mother).str.strip()
            if vigente is not None:
                carried = mothers.ffill().fillna(vigente)
            else:
                carried = mothers.ffill()
            fallback = desc.map(categoria_por_prefixo)
            categoria = carried.where(carried.notna(), fallback)
            counters = counter + has_qty.to_numpy().cumsum()
            out = pdf[
                ["turn_idx", "svc_idx", "Item", "Categoria", "Descricao", "Unidade", "Quantidade"]
            ].copy()
            out["conv_id"] = conv_id
            out["Categoria"] = categoria.where(categoria.notna(), None)
            out["qty_counter"] = counters.astype("int32")
            frames.append(out[
                ["conv_id", "turn_idx", "svc_idx", "Item", "Categoria",
                 "Descricao", "Unidade", "Quantidade", "qty_counter"]
            ])
            counter = int(counters[-1]) if len(counters) else counter
            last_mother = mothers.dropna()
            if len(last_mother):
                vigente = last_mother.iloc[-1]
        state.update((vigente, counter))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return svc.groupBy("conv_id").applyInPandasWithState(
        fn, CATEGORY_SCHEMA, _CATEGORY_STATE, "append", GroupStateTimeout.NoTimeout
    )
