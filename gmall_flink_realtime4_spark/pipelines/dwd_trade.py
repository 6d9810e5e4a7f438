"""DWD trade/interaction fact extraction from the topic_db CDC envelope.

One function per reference app; inputs are CDC-envelope DataFrames
(schemas.CDC_ENVELOPE) and small dim DataFrames; outputs are the flat fact
shapes of the dwd_* topics (FIXTURES.md §5). All map-key projections use
``data['col']`` exactly like the reference's FlinkSQL (P3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..operators.joins import interval_join


def _d(col: str) -> Column:
    return F.col("data")[col]


def _o(col: str) -> Column:
    return F.col("old")[col]


def _event_time(ts_col: str = "ts") -> Column:
    """CDC ts is epoch seconds (FIXTURES.md header; the reference multiplies
    by 1000 downstream, DwsTradeSkuOrderWindow.java:54)."""
    return F.expr(f"cast(timestamp_seconds({ts_col}) as timestamp_ntz)")


def _table_rows(cdc: DataFrame, table: str, types: tuple[str, ...]) -> DataFrame:
    """P2 — envelope filter `database='gmall' and table=X and type in (...)`
    (DwdTradeOrderDetail.java:26-41 pattern)."""
    return cdc.filter(
        (F.col("database") == "gmall")
        & (F.col("table") == table)
        & F.col("type").isin(*types)
    )


# ---------------------------------------------------------------------------
# DwdTradeCartAdd (DwdTradeCartAdd.java:22-60)
# ---------------------------------------------------------------------------
def cart_add(cdc: DataFrame) -> DataFrame:
    """Insert rows OR updates where sku_num increased (P4); delta sku_num
    ``if(type='insert', sku_num, new - old)`` (P5, :27,:40)."""
    rows = _table_rows(cdc, "cart_info", ("insert", "update")).filter(
        (F.col("type") == "insert")
        | (
            _o("sku_num").isNotNull()
            & (_d("sku_num").cast("bigint") > _o("sku_num").cast("bigint"))
        )
    )
    delta = F.when(F.col("type") == "insert", _d("sku_num")).otherwise(
        (_d("sku_num").cast("bigint") - _o("sku_num").cast("bigint")).cast("string")
    )
    return rows.select(
        _d("id").alias("id"),
        _d("user_id").alias("user_id"),
        _d("sku_id").alias("sku_id"),
        _d("cart_price").alias("cart_price"),
        delta.alias("sku_num"),
        _d("sku_name").alias("sku_name"),
        _d("create_time").alias("create_time"),
        F.col("ts"),
    )


# ---------------------------------------------------------------------------
# DwdTradeOrderDetail (DwdTradeOrderDetail.java:22-115)
# ---------------------------------------------------------------------------
def order_detail(cdc: DataFrame) -> DataFrame:
    """order_detail ⋈ order_info ⟕ order_detail_activity ⟕ order_detail_coupon.

    J1 inner + J2 left-outer joins on insert rows; the reference's retract/
    upsert output (K3) becomes an append stream — downstream DWS re-dedups
    by id anyway (A1 note, SURVEY §2.4).
    """
    od = _table_rows(cdc, "order_detail", ("insert",)).select(
        _d("id").alias("id"),
        _d("order_id").alias("order_id"),
        _d("sku_id").alias("sku_id"),
        _d("sku_name").alias("sku_name"),
        _d("order_price").alias("order_price"),
        _d("sku_num").alias("sku_num"),
        _d("create_time").alias("create_time"),
        _d("split_total_amount").alias("split_total_amount"),
        _d("split_activity_amount").alias("split_activity_amount"),
        _d("split_coupon_amount").alias("split_coupon_amount"),
        F.col("ts"),
    )
    oi = _table_rows(cdc, "order_info", ("insert",)).select(
        _d("id").alias("order_info_id"),
        _d("user_id").alias("user_id"),
        _d("province_id").alias("province_id"),
    )
    act = _table_rows(cdc, "order_detail_activity", ("insert",)).select(
        _d("order_detail_id").alias("act_order_detail_id"),
        _d("activity_id").alias("activity_id"),
        _d("activity_rule_id").alias("activity_rule_id"),
    )
    cou = _table_rows(cdc, "order_detail_coupon", ("insert",)).select(
        _d("order_detail_id").alias("cou_order_detail_id"),
        _d("coupon_id").alias("coupon_id"),
    )
    return (
        od.join(oi, od.order_id == oi.order_info_id)
        .join(act, od.id == act.act_order_detail_id, "left")
        .join(cou, od.id == cou.cou_order_detail_id, "left")
        .drop("order_info_id", "act_order_detail_id", "cou_order_detail_id")
    )


# ---------------------------------------------------------------------------
# DwdTradeOrderCancelDetail (DwdTradeOrderCancelDetail.java:20-81)
# ---------------------------------------------------------------------------
def order_cancel_detail(cdc: DataFrame, detail: DataFrame) -> DataFrame:
    """P4 — update rows transitioning 1001 -> 1003 (:47-57), joined to the
    dwd order_detail stream (J1, :60-81) with date_id (F-date1)."""
    cancel = _table_rows(cdc, "order_info", ("update",)).filter(
        (_o("order_status") == "1001") & (_d("order_status") == "1003")
    )
    c = cancel.select(
        _d("id").alias("cancel_order_id"),
        _d("operate_time").alias("cancel_time"),
        F.col("ts").alias("cancel_ts"),
    )
    # the emitted event time is the CANCEL event's ts (reference emits
    # oc.ts, DwdTradeOrderCancelDetail.java:78) — keeping the detail ts
    # would window the cancellation at order-placement time
    return detail.join(c, detail.order_id == c.cancel_order_id).select(
        *[detail[col] for col in detail.columns if col != "ts"],
        F.col("cancel_ts").alias("ts"),
        F.col("cancel_time"),
        F.date_format(F.to_timestamp("cancel_time"), "yyyy-MM-dd").alias("date_id"),
    )


# ---------------------------------------------------------------------------
# DwdTradeOrderPaySucDetail (DwdTradeOrderPaySucDetail.java:21-139)
# ---------------------------------------------------------------------------
def order_pay_suc_detail(
    cdc: DataFrame, detail: DataFrame, base_dic: DataFrame
) -> DataFrame:
    """P4 payment-success predicate + J3 interval join + J4 dic lookup.

    payment_info updates with ``old.payment_status is not null and
    data.payment_status='1602'`` (:21-37); interval-joined to order_detail
    within [detail - 15 min, detail + 5 s] (:66-87); payment_type enriched
    from base_dic via broadcast (:93-113).
    """
    pay = _table_rows(cdc, "payment_info", ("update",)).filter(
        _o("payment_status").isNotNull() & (_d("payment_status") == "1602")
    )
    p = pay.select(
        _d("order_id").alias("pay_order_id"),
        _d("user_id").alias("pay_user_id"),
        _d("payment_type").alias("payment_type"),
        _d("callback_time").alias("callback_time"),
        F.col("ts").alias("pay_ts"),
        _event_time("ts").alias("pay_time"),
    )
    d = detail.withColumn("detail_time", _event_time("ts"))
    joined = interval_join(
        p,
        d,
        F.col("pay_order_id") == d.order_id,
        "pay_time",
        "detail_time",
        "interval 15 minutes",
        "interval 5 seconds",
    )
    dic = F.broadcast(
        base_dic.select(
            F.col("dic_code").alias("payment_type"),
            F.col("dic_name").alias("payment_type_name"),
        )
    )
    return (
        joined.join(dic, "payment_type", "left")
        .drop("pay_order_id", "pay_time", "detail_time")
        .withColumnRenamed("pay_ts", "pay_suc_ts")
    )


# ---------------------------------------------------------------------------
# DwdTradeOrderRefund (DwdTradeOrderRefund.java:21-113)
# ---------------------------------------------------------------------------
def order_refund(cdc: DataFrame, base_dic: DataFrame) -> DataFrame:
    """refund inserts ⋈ order_info(1005 updates) + two dic lookups (dic1/dic2).

    P4: order_info update rows with data.order_status='1005' (:48-58);
    J4 x2: refund_type and refund_reason_type both against base_dic
    (:66-88 aliases dic1/dic2) — two broadcast joins here.
    """
    refund = _table_rows(cdc, "order_refund_info", ("insert",)).select(
        _d("id").alias("id"),
        _d("user_id").alias("user_id"),
        _d("order_id").alias("order_id"),
        _d("sku_id").alias("sku_id"),
        _d("refund_type").alias("refund_type"),
        _d("refund_num").alias("refund_num"),
        _d("refund_amount").alias("refund_amount"),
        _d("refund_reason_type").alias("refund_reason_type"),
        _d("refund_reason_txt").alias("refund_reason_txt"),
        _d("create_time").alias("create_time"),
        F.col("ts"),
    )
    oi = _table_rows(cdc, "order_info", ("update",)).filter(
        _d("order_status") == "1005"
    ).select(
        _d("id").alias("oi_order_id"),
        _d("province_id").alias("province_id"),
    )
    dic1 = F.broadcast(
        base_dic.select(
            F.col("dic_code").alias("refund_type"),
            F.col("dic_name").alias("refund_type_name"),
        )
    )
    dic2 = F.broadcast(
        base_dic.select(
            F.col("dic_code").alias("refund_reason_type"),
            F.col("dic_name").alias("refund_reason_type_name"),
        )
    )
    return (
        refund.join(oi, refund.order_id == oi.oi_order_id)
        .join(dic1, "refund_type", "left")
        .join(dic2, "refund_reason_type", "left")
        .withColumn(
            "date_id",
            F.date_format(F.to_timestamp("create_time"), "yyyy-MM-dd"),
        )
        .drop("oi_order_id")
    )


# ---------------------------------------------------------------------------
# DwdInteractionCommentInfo (DwdInteractionCommentInfo.java:18-56)
# ---------------------------------------------------------------------------
def comment_info(cdc: DataFrame, base_dic: DataFrame) -> DataFrame:
    """comment_info inserts + appraise dic lookup (J4 via broadcast)."""
    c = _table_rows(cdc, "comment_info", ("insert",)).select(
        _d("id").alias("id"),
        _d("user_id").alias("user_id"),
        _d("sku_id").alias("sku_id"),
        _d("spu_id").alias("spu_id"),
        _d("order_id").alias("order_id"),
        _d("appraise").alias("appraise"),
        _d("comment_txt").alias("comment_txt"),
        _d("create_time").alias("create_time"),
        F.col("ts"),
    )
    dic = F.broadcast(
        base_dic.select(
            F.col("dic_code").alias("appraise"),
            F.col("dic_name").alias("appraise_name"),
        )
    )
    return c.join(dic, "appraise", "left")


# ---------------------------------------------------------------------------
# DwdBaseDb (DwdBaseDb.java:56-139) — config-driven fact router
# ---------------------------------------------------------------------------
def base_db_route(cdc: DataFrame, config: DataFrame) -> DataFrame:
    """J8/W5 — broadcast-join CDC rows against table_process_dwd on the
    (source_table, source_type) key (:80-122), prune to sink_columns
    (:124-135), and emit the dynamic sink topic per row (K2 —
    FlinkSinkUtil.java:38-52; the kafka sink's per-row ``topic`` column)."""
    from .dim_app import broadcast_config, prune_to_cols

    cfg = broadcast_config(config, "source_type", "sink_table")
    joined = cdc.filter(
        (F.col("database") == "gmall") & F.col("data").isNotNull()
    ).join(
        cfg,
        (F.col("table") == F.col("source_table"))
        & (F.col("type") == F.col("source_type")),
    )
    return joined.select(
        F.col("sink_table"),
        prune_to_cols().alias("data"),
        F.col("ts"),
    )
