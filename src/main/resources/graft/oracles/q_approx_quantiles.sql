-- SF-PINNED snapshot oracle (1 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> q_approx_quantiles
WITH t(price_p25, price_p50, price_p75, qty_median) AS (VALUES
(CAST('26909.54' AS DOUBLE), CAST('52968.34' AS DOUBLE), CAST('79079.46' AS DOUBLE), CAST('25.0' AS DOUBLE)))
SELECT CAST(price_p25 AS DOUBLE) AS price_p25, CAST(price_p50 AS DOUBLE) AS price_p50, CAST(price_p75 AS DOUBLE) AS price_p75, CAST(qty_median AS DOUBLE) AS qty_median FROM t ORDER BY ALL