"""KPI builders checked against DuckDB running the reference's SQL
shapes (reference sql/*) over the same fixture rows."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def duck(silver):
    con = duckdb.connect()
    for name in ("bookings", "services", "service_providers", "provider_reviews",
                 "payment_records", "dispute_requests"):
        con.register(name, silver[name].toPandas())
    return con


def test_bookings_per_location_service(silver, duck):
    from prox_spark.kpi import bookings_per_location_service

    got = {
        (r.location, r.service_name): r.total_bookings
        for r in bookings_per_location_service(
            silver["bookings"], silver["services"], silver["service_providers"]
        ).collect()
    }
    want = {
        (loc, svc): n
        for loc, svc, n in duck.execute(
            """
            SELECT sp.location, s.service_name, COUNT(*) AS n
            FROM bookings b
            JOIN services s ON b.service_id = s.service_id
            JOIN service_providers sp ON s.provider_id = sp.provider_id
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want


def test_avg_rating_per_provider(silver, duck):
    from prox_spark.kpi import avg_rating_per_provider

    got = {
        r.provider_id: (r.avg_rating, r.n_reviews)
        for r in avg_rating_per_provider(
            silver["service_providers"], silver["provider_reviews"]
        ).collect()
    }
    want = {
        pid: (avg, n)
        for pid, avg, n in duck.execute(
            """
            SELECT r.provider_id, ROUND(AVG(r.rating), 2), COUNT(*)
            FROM provider_reviews r
            JOIN service_providers sp ON r.provider_id = sp.provider_id
            GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want


def test_monthly_revenue_per_provider(silver, duck):
    from prox_spark.kpi import monthly_revenue_per_provider

    got = {
        (str(r.month), r.provider_id): float(r.revenue)
        for r in monthly_revenue_per_provider(
            silver["payment_records"], silver["bookings"], silver["services"]
        ).collect()
    }
    want = {
        (str(m), pid): float(rev)
        for m, pid, rev in duck.execute(
            """
            SELECT DATE_TRUNC('month', p.created_at)::TIMESTAMP AS month, s.provider_id,
                   SUM(p.amount) AS revenue
            FROM payment_records p
            JOIN bookings b ON p.booking_id = b.booking_id
            JOIN services s ON b.service_id = s.service_id
            WHERE p.status = 'paid'
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want


def test_pct_ai_generated(silver, duck):
    from prox_spark.kpi import pct_ai_generated

    got = pct_ai_generated(silver["service_providers"]).first().pct_ai_generated
    want = duck.execute(
        """
        SELECT ROUND(100.0 * SUM(CASE WHEN is_ai_generated THEN 1 ELSE 0 END)
                     / COUNT(*), 2)
        FROM service_providers
        """
    ).fetchone()[0]
    assert got == pytest.approx(want)


def test_top5_providers_by_bookings(silver, duck):
    from prox_spark.kpi import top5_providers_by_bookings

    got = [
        (r.provider_id, r.total_bookings)
        for r in top5_providers_by_bookings(
            silver["bookings"], silver["services"], silver["service_providers"]
        ).collect()
    ]
    want = duck.execute(
        """
        SELECT s.provider_id, COUNT(*) AS n
        FROM bookings b
        JOIN services s ON b.service_id = s.service_id
        JOIN service_providers sp ON s.provider_id = sp.provider_id
        GROUP BY 1 ORDER BY n DESC, s.provider_id LIMIT 5
        """
    ).fetchall()
    assert got == [(pid, n) for pid, n in want]


def test_top5_disputed_providers(silver, duck):
    from prox_spark.kpi import top5_disputed_providers

    got = [
        (r.provider_id, r.dispute_count)
        for r in top5_disputed_providers(
            silver["dispute_requests"], silver["bookings"],
            silver["services"], silver["service_providers"],
        ).collect()
    ]
    want = duck.execute(
        """
        SELECT s.provider_id, COUNT(*) AS n
        FROM dispute_requests d
        JOIN bookings b ON d.booking_id = b.booking_id
        JOIN services s ON b.service_id = s.service_id
        JOIN service_providers sp ON s.provider_id = sp.provider_id
        GROUP BY 1 ORDER BY n DESC, s.provider_id LIMIT 5
        """
    ).fetchall()
    assert got == [(pid, n) for pid, n in want]


def test_topk_plan_is_take_ordered(silver):
    """ORDER BY … LIMIT k must plan as TakeOrderedAndProject, not a
    global sort (SURVEY.md §2.6 T2)."""
    from prox_spark.kpi import top5_providers_by_bookings

    plan = (
        top5_providers_by_bookings(
            silver["bookings"], silver["services"], silver["service_providers"]
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_sql_entry_point_matches_builder(spark, silver):
    """SURVEY.md §3.3: the same KPI expressed as SQL text over temp
    views must agree with the DataFrame builder — SQL and DataFrame
    APIs produce the same logical plan IR."""
    from prox_spark.kpi import top5_providers_by_bookings

    for name in ("bookings", "services", "service_providers"):
        silver[name].createOrReplaceTempView(name)
    via_sql = spark.sql(
        """
        SELECT s.provider_id, sp.business_name, COUNT(*) AS total_bookings
        FROM bookings b
        JOIN services s ON b.service_id = s.service_id
        JOIN service_providers sp ON s.provider_id = sp.provider_id
        GROUP BY s.provider_id, sp.business_name
        ORDER BY total_bookings DESC, s.provider_id
        LIMIT 5
        """
    ).collect()
    via_df = top5_providers_by_bookings(
        silver["bookings"], silver["services"], silver["service_providers"]
    ).collect()
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]
