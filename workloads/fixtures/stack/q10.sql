SELECT COUNT(*) FROM question as q, post_link as pl
WHERE pl.post_id_from = q.id AND pl.site_id = q.site_id
  AND pl.link_type_id = 3 AND q.score >= 1;
