SELECT COUNT(*) FROM users as u, posts as p WHERE p.OwnerUserId = u.Id AND u.Views>=124 AND u.CreationDate>='2014-03-21 23:34:32'::timestamp AND p.CommentCount>=3;
