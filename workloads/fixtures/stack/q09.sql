SELECT COUNT(*) FROM question as q, comment as c
WHERE c.post_id = q.id AND c.site_id = q.site_id
  AND c.score >= 5 AND q.score >= 10
  AND q.creation_date >= '2011-06-01 00:00:00'::timestamp;
