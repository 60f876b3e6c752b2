-- graft function library, PostgreSQL dialect.
--
-- Installed into the configured Postgres sink after every import so that
-- post-load hook scripts can call these server-side, mirroring the Spark
-- registrations in graft.functions.Functions.registerAll (the two-lane
-- contract: same names, same semantics, either engine).
-- Semantics follow /root/reference/postgresimporter/hooks/functions.sql:1-65.

-- Trim leading/trailing newlines and carriage returns, drop every
-- double-quote character, and collapse the empty string to NULL.
CREATE OR REPLACE FUNCTION strip(text) RETURNS text
    LANGUAGE SQL IMMUTABLE STRICT
    AS $$ SELECT NULLIF(regexp_replace($1, E'(^[\\n\\r]+)|(")|([\\n\\r]+$)', '', 'g'), '') $$;

-- TRUE when column $3 exists on table $2 in schema $1.
CREATE OR REPLACE FUNCTION has_column(text, text, text) RETURNS boolean
    LANGUAGE SQL IMMUTABLE STRICT
    AS $$ SELECT EXISTS (
            SELECT 1 FROM information_schema.columns
            WHERE table_schema = $1 AND table_name = $2 AND column_name = $3) $$;

-- Pull the trailing three-letter named zone out of an Oracle-style
-- timestamp string such as '28-MAR-19 05.02.10.000000000 AM GMT'.
CREATE OR REPLACE FUNCTION parse_timezone(text) RETURNS text
    LANGUAGE SQL IMMUTABLE STRICT
    AS $$ SELECT (regexp_matches($1, '\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.?\d{0,9} (?:AM|PM) (\w\w\w)'))[ 1 ] $$;

-- Interpret a wall-clock string with format $2 in named zone $3, yielding
-- a timestamptz normalized to the session time zone.
CREATE OR REPLACE FUNCTION parse_timestamp_with_tz(text, text, text) RETURNS timestamp with time zone
    LANGUAGE SQL IMMUTABLE STRICT
    AS $$ SELECT to_timestamp($1, $2) AT TIME ZONE $3 AT TIME ZONE (SELECT current_setting('timezone')) $$;

-- Five-branch timestamp dispatch over the Oracle export shapes:
--   1. '31-JAN-19 03.20.00.000000000 PM +01:00'  (nanos + numeric offset)
--   2. '31-JAN-19 03.20.00 PM +01:00'            (no fraction + offset)
--   3. '28-MAR-19 05.02.10.000000000 AM GMT'     (nanos + named zone)
--   4. '28-MAR-19 05.02.10 AM GMT'               (no fraction + named zone)
--   5. '20190101013449+0000'                     (compact + offset)
-- Anything else yields NULL.
CREATE OR REPLACE FUNCTION parse_timestamp(text) RETURNS timestamp with time zone
    LANGUAGE SQL IMMUTABLE STRICT
    AS $$ SELECT CASE
        WHEN $1 ~ '\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.\d\d\d\d\d\d\d\d\d (?:AM|PM) (\+|-)\d\d:\d\d'
            THEN to_timestamp($1, 'FXDD-MON-YY HH12.MI.SS.          PM TZH:TZM')
        WHEN $1 ~ '\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d (?:AM|PM) (\+|-)\d\d:\d\d'
            THEN to_timestamp($1, 'FXDD-MON-YY HH12.MI.SS PM TZH:TZM')
        WHEN $1 ~ '\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.\d\d\d\d\d\d\d\d\d (?:AM|PM) (\w\w\w)'
            THEN parse_timestamp_with_tz($1, 'FXDD-MON-YY HH12.MI.SS.          PM', parse_timezone($1))
        WHEN $1 ~ '\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d (?:AM|PM) (\w\w\w)'
            THEN parse_timestamp_with_tz($1, 'FXDD-MON-YY HH12.MI.SS PM', parse_timezone($1))
        WHEN $1 ~ '\d\d\d\d\d\d\d\d\d\d\d\d\d\d(\+|-)\d\d\d\d'
            THEN to_timestamp($1, 'YYYYMMDDHH24MISS TZHTZM')
        END $$;

-- '01-FEB-19' → DATE (two-digit year resolves into the current century).
CREATE OR REPLACE FUNCTION parse_date(text) RETURNS date
    LANGUAGE SQL IMMUTABLE STRICT
    AS $$ SELECT to_date($1, 'FXDD-MON-YY') $$;
