--
-- PostgreSQL database dump
--

\restrict C1XubIkNkghclGBowNMS5GNqbYphqalor132u6k1Y7h574SCFGvKodX1dniVN4G

-- Dumped from database version 15.18
-- Dumped by pg_dump version 15.18 (Debian 15.18-0+deb12u1)

SET statement_timeout = 0;
SET lock_timeout = 0;
SET idle_in_transaction_session_timeout = 0;
SET client_encoding = 'UTF8';
SET standard_conforming_strings = off;
SELECT pg_catalog.set_config('search_path', 'public', false);
SET check_function_bodies = false;
SET xmloption = content;
SET client_min_messages = warning;
SET escape_string_warning = off;
SET row_security = off;

SET default_tablespace = '';

SET default_table_access_method = heap;

--
-- Name: accounts; Type: TABLE; Schema: public; Owner: bemidb
--

CREATE TABLE public.accounts (
    id bigint,
    name text,
    balance double precision
);


ALTER TABLE public.accounts OWNER TO bemidb;

--
-- Name: events_log; Type: TABLE; Schema: public; Owner: bemidb
--

CREATE TABLE public.events_log (
    event_id bigint,
    user_id bigint,
    event_type text,
    ts timestamp without time zone
);


ALTER TABLE public.events_log OWNER TO bemidb;

--
-- PostgreSQL database dump complete
--

\unrestrict C1XubIkNkghclGBowNMS5GNqbYphqalor132u6k1Y7h574SCFGvKodX1dniVN4G

