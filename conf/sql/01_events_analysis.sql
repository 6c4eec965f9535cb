-- S5 analysis template: the reference's stock_bars_analysis.sql
-- (drop-and-recreate CTAS over window analytics) in Spark dialect,
-- templated on the source table. Rounding uses the engine-portable
-- guarded HALF_UP formula (see graft.functions.Rounding).
DROP TABLE IF EXISTS {{ table }}_analysis;

CREATE TABLE {{ table }}_analysis AS
WITH prev AS (
  SELECT event_type, event_id, ts, CAST(ts AS DATE) AS dt, value,
         LAG(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_value
  FROM {{ table }}),
ret AS (
  SELECT *, ((CAST(CASE WHEN ((value - prev_value) / nullif(prev_value, 0.0)) < 0 THEN -floor((-((value - prev_value) / nullif(prev_value, 0.0)))*1000.0 + 0.5) ELSE floor(((value - prev_value) / nullif(prev_value, 0.0))*1000.0 + 0.5) END AS DOUBLE) / 1000.0 + 0.0)) AS daily_return FROM prev)
SELECT event_type, event_id, dt, value, prev_value, daily_return,
       ((CAST(CASE WHEN (daily_return * 100) < 0 THEN -floor((-(daily_return * 100))*10.0 + 0.5) ELSE floor((daily_return * 100)*10.0 + 0.5) END AS DOUBLE) / 10.0 + 0.0)) AS daily_return_pct,
       ((CAST(CASE WHEN (AVG(value) OVER w) < 0 THEN -floor((-(AVG(value) OVER w))*100.0 + 0.5) ELSE floor((AVG(value) OVER w)*100.0 + 0.5) END AS DOUBLE) / 100.0 + 0.0)) AS moving_avg_5,
       ((CAST(CASE WHEN (STDDEV_SAMP(daily_return) OVER w) < 0 THEN -floor((-(STDDEV_SAMP(daily_return) OVER w))*100.0 + 0.5) ELSE floor((STDDEV_SAMP(daily_return) OVER w)*100.0 + 0.5) END AS DOUBLE) / 100.0 + 0.0)) AS stddev_5
FROM ret
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY event_type, ts, event_id;
