SELECT COUNT(*) FROM site as s, question as q
WHERE q.site_id = s.site_id AND s.site_name = 'stackoverflow' AND q.score >= 10;
